// Native host-side data-path kernels.
//
// The TPU compute path is JAX/XLA; the host runtime around it benefits from
// native code where Python-loop overhead dominates.  These kernels back the
// batching pipeline (data/pipeline.py): packing ragged float32 keypoint
// videos into padded (B, T_pad, K, C) buckets, and building frame-validity
// masks, at memcpy speed.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libkitpack.so kitpack.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Pack ragged videos into a zero-padded batch.
//   src:      concatenated frames, sum(lengths) * frame_size floats
//   offsets:  per-video start offset into src, in FRAMES (n items)
//   lengths:  per-video frame counts (n items)
//   out:      (n, t_pad, frame_size) float32, fully overwritten
//   out_len:  per-video clamped lengths (n items)
void kitpack_pad_videos(const float* src, const int64_t* offsets,
                        const int64_t* lengths, int64_t n, int64_t t_pad,
                        int64_t frame_size, float* out, int32_t* out_len) {
    const int64_t video_stride = t_pad * frame_size;
    std::memset(out, 0, sizeof(float) * static_cast<size_t>(n) *
                            static_cast<size_t>(video_stride));
    for (int64_t i = 0; i < n; ++i) {
        const int64_t t = std::min<int64_t>(lengths[i], t_pad);
        out_len[i] = static_cast<int32_t>(t);
        std::memcpy(out + i * video_stride,
                    src + offsets[i] * frame_size,
                    sizeof(float) * static_cast<size_t>(t) *
                        static_cast<size_t>(frame_size));
    }
}

// Frame-validity mask: valid[i, t] = t < lengths[i].
void kitpack_valid_mask(const int32_t* lengths, int64_t n, int64_t t_pad,
                        float* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t t = std::min<int64_t>(lengths[i], t_pad);
        float* row = out + i * t_pad;
        std::fill(row, row + t, 1.0f);
        std::fill(row + t, row + t_pad, 0.0f);
    }
}

// Interleave/copy with SOS-frame prepend: out[i, 0, :] = sos_value,
// out[i, 1:t+1, :] = src video, rest zero.  Used when materializing
// precorrupted validation tensors.
void kitpack_pad_with_sos(const float* src, const int64_t* offsets,
                          const int64_t* lengths, int64_t n, int64_t t_pad,
                          int64_t frame_size, float sos_value, float* out,
                          int32_t* out_len) {
    const int64_t video_stride = (t_pad + 1) * frame_size;
    std::memset(out, 0, sizeof(float) * static_cast<size_t>(n) *
                            static_cast<size_t>(video_stride));
    for (int64_t i = 0; i < n; ++i) {
        const int64_t t = std::min<int64_t>(lengths[i], t_pad);
        out_len[i] = static_cast<int32_t>(t);
        float* dst = out + i * video_stride;
        std::fill(dst, dst + frame_size, sos_value);
        std::memcpy(dst + frame_size, src + offsets[i] * frame_size,
                    sizeof(float) * static_cast<size_t>(t) *
                        static_cast<size_t>(frame_size));
    }
}

int64_t kitpack_abi_version() { return 1; }

}  // extern "C"
