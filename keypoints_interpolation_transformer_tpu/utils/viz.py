"""Skeleton rendering and validation strips.

Re-derivation of the reference's wandb imagery (utils.py:28-101 skeleton
frames, utils.py:137-156 input/prediction/ground-truth strips).  cv2 is
optional; a pure-numpy rasterizer is the fallback so hermetic environments
still produce images.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.keypoints import skeleton_edges

SIZE = 256


def _np_line(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1).astype(int)
    ys = np.linspace(p0[1], p1[1], n + 1).astype(int)
    ok = (xs >= 0) & (xs < SIZE) & (ys >= 0) & (ys < SIZE)
    img[ys[ok], xs[ok]] = color
    return img


def render_frame(keypoints: np.ndarray, edges: Optional[np.ndarray] = None,
                 label: Optional[str] = None,
                 frame_idx: Optional[int] = None) -> np.ndarray:
    """(K, 2) normalized keypoints -> (256, 256, 3) uint8 image."""
    edges = skeleton_edges() if edges is None else edges
    pts = (np.asarray(keypoints) * SIZE).astype(int)

    try:
        import cv2
        img = np.zeros((SIZE, SIZE, 3), np.uint8)
        if frame_idx is not None:
            cv2.putText(img, str(frame_idx), (220, 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 2,
                        cv2.LINE_AA)
        if label:
            cv2.putText(img, label, (20, 20), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 255, 0), 2, cv2.LINE_AA)
        for a, b in edges:
            pa, pb = tuple(pts[a]), tuple(pts[b])
            cv2.line(img, pa, pb, (0, 255, 0), 2)
            cv2.circle(img, pa, 2, (0, 0, 255), -1)
            cv2.circle(img, pb, 2, (0, 0, 255), -1)
        return img
    except ImportError:
        img = np.zeros((SIZE, SIZE, 3), np.uint8)
        for a, b in edges:
            img = _np_line(img, pts[a], pts[b], (0, 255, 0))
        ok = (pts[:, 0] >= 0) & (pts[:, 0] < SIZE) & \
            (pts[:, 1] >= 0) & (pts[:, 1] < SIZE)
        img[pts[ok, 1], pts[ok, 0]] = (0, 0, 255)
        return img


def render_strip(video: np.ndarray, label: str = "",
                 edges: Optional[np.ndarray] = None) -> np.ndarray:
    """(T, K, 2) -> horizontal strip of rendered frames."""
    frames = [render_frame(video[t], edges,
                           label if t == 0 else None, t)
              for t in range(len(video))]
    return np.concatenate(frames, axis=1)


def validation_image(inputs: np.ndarray, prediction: np.ndarray,
                     sota: np.ndarray, path: Optional[str] = None
                     ) -> np.ndarray:
    """Three stacked strips: input / prediction / ground truth
    (sent_validation_result, utils.py:137-156)."""
    rows = [render_strip(inputs, "Input"),
            render_strip(prediction, "Prediction"),
            render_strip(sota, "Sota")]
    w = min(r.shape[1] for r in rows)
    out = np.concatenate([r[:, :w] for r in rows], axis=0)
    if path:
        try:
            import cv2
            cv2.imwrite(path, out)
        except ImportError:
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                plt.imsave(path, out[..., ::-1])
            except ImportError:
                pass
    return out


def test_result_image(model, params, video: np.ndarray,
                      frame_mask: np.ndarray,
                      edges: Optional[np.ndarray] = None,
                      path: Optional[str] = None) -> np.ndarray:
    """One-row strip of the model's prediction on a single test video.

    Working equivalent of the reference's ``sent_test_result``
    (utils.py:124-135), which is dead-broken there: it calls
    ``model.get_src_mask`` — a method that does not exist on either
    reference model — and logs to wandb only.  Here the forward uses the
    model's real masking API and the strip is returned (and optionally
    written) like the validation strips.
    """
    import jax.numpy as jnp

    v = jnp.asarray(video, jnp.float32)[None]          # (1, T, K, 2)
    m = jnp.asarray(frame_mask, jnp.float32)[None]     # (1, T)
    pred = model.apply(params, v, v, src_frame_mask=m, tgt_frame_mask=m)
    strip = render_strip(np.asarray(pred[0]), "Test", edges)
    if path:
        try:
            import cv2
            cv2.imwrite(path, strip)
        except ImportError:
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                plt.imsave(path, strip[..., ::-1])
            except ImportError:
                pass
    return strip
