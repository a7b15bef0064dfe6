"""Pallas TPU whole-layer fusions: transformer sublayer PAIRS in one pass.

With the attention-sublayer (ops/pallas/attn_sublayer.py) and FF-sublayer
(ops/pallas/ffn.py) kernels, the only HBM traffic left in an encoder
layer is the (B, T, D) hand-off between them (write r, read r — ~82 us
per boundary at the flagship shape).  These kernels remove it:

  * fused_encoder_layer: x -> [self-attn + residual] -> [LN1 -> FF ->
    residual -> LN2] with the intermediate r living only in VMEM
    (reference: one torch TransformerEncoderLayer, model.py:84-90).
  * fused_decoder_selfcross: x -> LN1(x + self-attn) -> (+ cross-attn
    residual), the decoder's two attention sublayers in one pass; the
    FF kernel then absorbs norm2/norm3 as before.

Same MXU strategy, bias construction, exp2 softmax, parameter layout and
XLA-reference backward (jax.custom_vjp) as the per-sublayer kernels.
Stationary weights cap the supported width (see supported())."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (LOG2E as _LOG2E, _bias_terms_T, _mxu_mode, _prep,
                        _xla_attention)
from .attn_sublayer import _attn_core, _ln, _proj
from .ffn import _gelu_exact, _int8_dot, _stack_weight_3x

_MAX_T = 256   # full-T VMEM residency incl. the (R, FF) FF intermediates


def fused_layer_supported(T: int, D: int, ff_dim: int) -> bool:
    """Stationary weights (qkvo + FF, bf16x3-stacked) plus one row-block
    of FF intermediates must fit scoped VMEM with margin."""
    wbytes = 6 * (4 * D * D + 2 * D * ff_dim)  # bf16x3 stacked, 6 bytes/elem
    return T <= _MAX_T and T % 8 == 0 and wbytes <= (8 << 20)


def decoder_full_supported(T: int, D: int, ff_dim: int) -> bool:
    """Whole-decoder-layer fusion: 8 attention weights + the FF pair
    stationary (bb is pinned to 1 for this variant)."""
    wbytes = 6 * (8 * D * D + 2 * D * ff_dim)
    return T <= _MAX_T and T % 8 == 0 and wbytes <= (10 << 20)


def _prep_w(ws, mode):
    if mode == "bf16x3":
        return [_stack_weight_3x(w) for w in ws]
    if mode == "bf16":
        return [w.astype(jnp.bfloat16) for w in ws]
    return [w.astype(jnp.float32) for w in ws]


def _quant_w(w):
    """Symmetric per-output-channel int8 weight quantization (in-graph;
    XLA folds it when the weights are trace constants)."""
    w = w.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                     1e-12) / 127.0
    q = jnp.clip(jnp.round(w / sc), -127, 127).astype(jnp.int8)
    return q, sc


def _quant_pairs(ws):
    out = []
    for w in ws:
        q, s = _quant_w(w)
        out += [q, s]
    return out


def _enc_kernel(x_ref, mask_ref, valid_ref, *rest, kind, add_keypad,
                heads, dh, bb, mode, n_w, ff_int8=False, attn_int8=False,
                has_valid=True):
    w_refs = rest[:n_w]
    (bq_r, bk_r, bv_r, bo_r, b1_r, b2_r, g1_r, be1_r, g2_r,
     be2_r) = rest[n_w:n_w + 10]
    o_ref = rest[-1]
    n_attn = 8 if attn_int8 else None
    if attn_int8:
        # first 8 operands: (q, scale) int8 pairs for wq/wk/wv/wo
        wq, wk, wv, wo = (
            (w_refs[2 * i][...], w_refs[2 * i + 1][...]) for i in range(4))
        rest_w = w_refs[8:]
    else:
        rest_w = w_refs
    if ff_int8:
        if not attn_int8:
            per = (n_w - 4) // 4
            wq, wk, wv, wo = (
                tuple(r[...] for r in rest_w[i * per:(i + 1) * per])
                for i in range(4))
        w1q, w1s, w2q, w2s = (r[...] for r in w_refs[-4:])
        w1 = w2 = None
    else:
        per = len(rest_w) // (2 if attn_int8 else 6)
        if attn_int8:
            w1, w2 = (tuple(r[...] for r in rest_w[i * per:(i + 1) * per])
                      for i in range(2))
        else:
            wq, wk, wv, wo, w1, w2 = (
                tuple(r[...] for r in rest_w[i * per:(i + 1) * per])
                for i in range(6))
    bq_, bk_, bv_, bo_, b1, b2 = (
        r[0].astype(jnp.float32)
        for r in (bq_r, bk_r, bv_r, bo_r, b1_r, b2_r))
    g1, be1, g2, be2 = (r[0].astype(jnp.float32)
                        for r in (g1_r, be1_r, g2_r, be2_r))
    T = x_ref.shape[1]
    D = x_ref.shape[2]

    x2d = x_ref[...].astype(jnp.float32).reshape(bb * T, D)
    if attn_int8:
        # projections int8-on-MXU with in-kernel dynamic per-token
        # activation scales (same scheme as the FF int8 mode); the
        # attention core itself stays float — scores/probs dominate its
        # accuracy and the projection matmuls its FLOPs
        q_all = _int8_dot(x2d, wq[0], wq[1][0]) + bq_
        k_all = _int8_dot(x2d, wk[0], wk[1][0]) + bk_
        v_all = _int8_dot(x2d, wv[0], wv[1][0]) + bv_
    else:
        xp = _prep(x2d, mode)
        q_all = _proj(xp, wq, bq_, mode)
        k_all = _proj(xp, wk, bk_, mode)
        v_all = _proj(xp, wv, bv_, mode)
    outs = []
    for b in range(bb):
        rows = slice(b * T, (b + 1) * T)
        bias = _bias_terms_T(mask_ref[b, 0],
                             valid_ref[b, 0] if has_valid else None, T,
                             kind, add_keypad, 0, T, mul=_LOG2E)
        outs.append(_attn_core(q_all[rows], k_all[rows], v_all[rows],
                               bias, heads, dh, mode))
    a_all = outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)
    if attn_int8:
        r = x2d + _int8_dot(a_all, wo[0], wo[1][0]) + bo_
    else:
        r = x2d + _proj(_prep(a_all, mode), wo, bo_, mode)

    # FF sublayer, r never leaving VMEM (post-LN torch layer)
    x1 = _ln(r, g1, be1)
    if ff_int8:
        u = _int8_dot(x1, w1q, w1s[0]) + b1
        h = _gelu_exact(u)
        z = x1 + _int8_dot(h, w2q, w2s[0]) + b2
    else:
        u = _proj(_prep(x1, mode), w1, b1, mode)
        h = _gelu_exact(u)
        z = x1 + _proj(_prep(h, mode), w2, b2, mode)
    y = _ln(z, g2, be2)
    o_ref[...] = y.reshape(bb, T, D).astype(o_ref.dtype)


def _enc_fwd_pallas(x, params, mask, valid, kind, add_keypad, heads,
                    ff_int8=False, attn_int8=False):
    (wq, bq_, wk, bk_, wv, bv_, wo, bo_, w1, b1, w2, b2,
     g1, be1, g2, be2) = params
    B, T, D = x.shape
    FFD = w1.shape[1]
    dh = D // heads
    qscale = _LOG2E / math.sqrt(dh)
    wq = wq * qscale
    bq_ = bq_ * qscale
    has_valid = valid is not None
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)
    mode = _mxu_mode(x.dtype)
    # f32 weights/intermediates double the bf16 footprint — single-row
    # cells keep the worst case inside scoped VMEM
    bb = 1 if (mode == "f32" or T * FFD * 4 * 3 > (4 << 20)) else 2
    while B % bb:
        bb //= 2

    row_spec = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bb, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    attn_ops = (_quant_pairs([wq, wk, wv, wo]) if attn_int8
                else _prep_w([wq, wk, wv, wo], mode))
    if ff_int8:
        w_ops = attn_ops + _quant_pairs([w1, w2])
    else:
        w_ops = attn_ops + _prep_w([w1, w2], mode)
    n_w = len(w_ops)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (bq_, bk_, bv_, bo_, b1, b2, g1, be1, g2, be2)]

    return pl.pallas_call(
        functools.partial(_enc_kernel, kind=kind, add_keypad=add_keypad,
                          heads=heads, dh=dh, bb=bb, mode=mode, n_w=n_w,
                          ff_int8=ff_int8, attn_int8=attn_int8,
                          has_valid=has_valid),
        grid=(B // bb,),
        in_specs=[row_spec, vec_spec, vec_spec,
                  *[const_spec(w.shape) for w in w_ops],
                  *[const_spec(v.shape) for v in vecs]],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, mask[:, None, :], valid[:, None, :], *w_ops, *vecs)


def encoder_layer_reference(x, params, mask, valid, kind, add_keypad,
                            heads):
    """Pure-XLA same math (backward + CPU fallback + test oracle)."""
    (wq, bq_, wk, bk_, wv, bv_, wo, bo_, w1, b1, w2, b2,
     g1, be1, g2, be2) = params
    B, T, D = x.shape
    dh = D // heads
    q = (jnp.dot(x, wq) + bq_).reshape(B, T, heads, dh)
    k = (jnp.dot(x, wk) + bk_).reshape(B, T, heads, dh)
    v = (jnp.dot(x, wv) + bv_).reshape(B, T, heads, dh)
    a, _ = _xla_attention(q, k, v, mask, valid, kind, add_keypad)
    r = x + jnp.dot(a.reshape(B, T, D), wo) + bo_
    x1 = _ln(r, g1, be1)
    h = jax.nn.gelu(jnp.dot(x1, w1) + b1, approximate=False)
    z = x1 + jnp.dot(h, w2) + b2
    return _ln(z, g2, be2)


# ---------------------------------------------------------------------------
# Decoder self-attention + cross-attention pair, optionally with the FF
# tail fused in too (with_ff: a whole decoder layer in ONE kernel)
# ---------------------------------------------------------------------------


def _dec_kernel(x_ref, mem_ref, smask_ref, svalid_ref, cmask_ref,
                cvalid_ref, *rest, skind, sadd_keypad, ckind,
                cadd_keypad, heads, dh, bb, mode, n_w, with_ff,
                attn_int8=False, has_svalid=True, has_cvalid=True):
    w_refs = rest[:n_w]
    n_attn_w = n_w - (2 if with_ff else 0)
    b_refs = rest[n_w:n_w + 8]
    ln_tail = rest[n_w + 8:-1]
    g1_r, be1_r = ln_tail[:2]
    o_ref = rest[-1]
    per = n_attn_w // 8
    sq, sk, sv, so, cq, ck, cv, co = (
        tuple(r[...] for r in w_refs[i * per:(i + 1) * per])
        for i in range(8))
    (sbq, sbk, sbv, sbo, cbq, cbk, cbv, cbo) = (
        r[0].astype(jnp.float32) for r in b_refs)
    g1, be1 = g1_r[0].astype(jnp.float32), be1_r[0].astype(jnp.float32)
    if with_ff:
        w1 = (w_refs[n_attn_w][...],)
        w2 = (w_refs[n_attn_w + 1][...],)
        b1, b2, g2, be2, g3, be3 = (r[0].astype(jnp.float32)
                                    for r in ln_tail[2:8])
    T = x_ref.shape[1]
    for b in range(bb):
        x = x_ref[b].astype(jnp.float32)
        m = mem_ref[b].astype(jnp.float32)
        if attn_int8:
            # projections int8-on-MXU (weights arrive as (int8, scale)
            # pairs); the attention core stays float
            q = _int8_dot(x, sq[0], sq[1][0]) + sbq
            k = _int8_dot(x, sk[0], sk[1][0]) + sbk
            v = _int8_dot(x, sv[0], sv[1][0]) + sbv
        else:
            xp = _prep(x, mode)
            q = _proj(xp, sq, sbq, mode)
            k = _proj(xp, sk, sbk, mode)
            v = _proj(xp, sv, sbv, mode)
        bias = _bias_terms_T(smask_ref[b, 0],
                             svalid_ref[b, 0] if has_svalid else None, T,
                             skind, sadd_keypad, 0, T, mul=_LOG2E)
        a = _attn_core(q, k, v, bias, heads, dh, mode)
        if attn_int8:
            x1 = _ln(x + _int8_dot(a, so[0], so[1][0]) + sbo, g1, be1)
            q2 = _int8_dot(x1, cq[0], cq[1][0]) + cbq
            k2 = _int8_dot(m, ck[0], ck[1][0]) + cbk
            v2 = _int8_dot(m, cv[0], cv[1][0]) + cbv
        else:
            x1 = _ln(x + _proj(_prep(a, mode), so, sbo, mode), g1, be1)
            mp = _prep(m, mode)
            q2 = _proj(_prep(x1, mode), cq, cbq, mode)
            k2 = _proj(mp, ck, cbk, mode)
            v2 = _proj(mp, cv, cbv, mode)
        cbias = _bias_terms_T(cmask_ref[b, 0],
                              cvalid_ref[b, 0] if has_cvalid else None, T,
                              ckind, cadd_keypad, 0, T, mul=_LOG2E)
        a2 = _attn_core(q2, k2, v2, cbias, heads, dh, mode)
        if attn_int8:
            r = x1 + _int8_dot(a2, co[0], co[1][0]) + cbo
        else:
            r = x1 + _proj(_prep(a2, mode), co, cbo, mode)
        if with_ff:
            x2 = _ln(r, g2, be2)
            u = _proj(_prep(x2, mode), w1, b1, mode)
            h = _gelu_exact(u)
            z = x2 + _proj(_prep(h, mode), w2, b2, mode)
            r = _ln(z, g3, be3)
        o_ref[b] = r.astype(o_ref.dtype)


def _dec_fwd_pallas(x, memory, params, smask, svalid, cmask, cvalid,
                    skind, sadd_keypad, ckind, cadd_keypad, heads,
                    ff_params=None, attn_int8=False):
    (sqw, sqb, skw, skb, svw, svb, sow, sob,
     cqw, cqb, ckw, ckb, cvw, cvb, cow, cob, g1, be1) = params
    B, T, D = x.shape
    dh = D // heads
    qscale = _LOG2E / math.sqrt(dh)
    sqw, sqb = sqw * qscale, sqb * qscale
    cqw, cqb = cqw * qscale, cqb * qscale
    has_svalid = svalid is not None
    has_cvalid = cvalid is not None
    if svalid is None:
        svalid = jnp.ones((B, T), jnp.float32)
    if cvalid is None:
        cvalid = jnp.ones((B, T), jnp.float32)
    mode = _mxu_mode(x.dtype)
    with_ff = ff_params is not None
    bb = 1 if (mode == "f32" or with_ff) else 2
    while B % bb:
        bb //= 2

    row_spec = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bb, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    attn_ws = [sqw, skw, svw, sow, cqw, ckw, cvw, cow]
    w_ops = _quant_pairs(attn_ws) if attn_int8 else _prep_w(attn_ws, mode)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (sqb, skb, svb, sob, cqb, ckb, cvb, cob, g1, be1)]
    if with_ff:
        assert not attn_int8  # int8 serving fuses the FF tail separately
        w1, b1, w2, b2, g2, be2, g3, be3 = ff_params
        w_ops += _prep_w([w1, w2], mode)
        vecs += [v.reshape(1, -1).astype(jnp.float32)
                 for v in (b1, b2, g2, be2, g3, be3)]
    n_w = len(w_ops)

    return pl.pallas_call(
        functools.partial(_dec_kernel, skind=skind,
                          sadd_keypad=sadd_keypad, ckind=ckind,
                          cadd_keypad=cadd_keypad, heads=heads, dh=dh,
                          bb=bb, mode=mode, n_w=n_w, with_ff=with_ff,
                          attn_int8=attn_int8, has_svalid=has_svalid,
                          has_cvalid=has_cvalid),
        grid=(B // bb,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec,
                  vec_spec, *[const_spec(w.shape) for w in w_ops],
                  *[const_spec(v.shape) for v in vecs]],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, memory, smask[:, None, :], svalid[:, None, :],
      cmask[:, None, :], cvalid[:, None, :], *w_ops, *vecs)


def decoder_selfcross_reference(x, memory, params, smask, svalid, cmask,
                                cvalid, skind, sadd_keypad, ckind,
                                cadd_keypad, heads, ff_params=None):
    """Pure-XLA same math (backward + CPU fallback + test oracle)."""
    (sqw, sqb, skw, skb, svw, svb, sow, sob,
     cqw, cqb, ckw, ckb, cvw, cvb, cow, cob, g1, be1) = params
    B, T, D = x.shape
    dh = D // heads
    q = (jnp.dot(x, sqw) + sqb).reshape(B, T, heads, dh)
    k = (jnp.dot(x, skw) + skb).reshape(B, T, heads, dh)
    v = (jnp.dot(x, svw) + svb).reshape(B, T, heads, dh)
    a, _ = _xla_attention(q, k, v, smask, svalid, skind, sadd_keypad)
    x1 = _ln(x + jnp.dot(a.reshape(B, T, D), sow) + sob, g1, be1)
    q2 = (jnp.dot(x1, cqw) + cqb).reshape(B, T, heads, dh)
    k2 = (jnp.dot(memory, ckw) + ckb).reshape(B, T, heads, dh)
    v2 = (jnp.dot(memory, cvw) + cvb).reshape(B, T, heads, dh)
    a2, _ = _xla_attention(q2, k2, v2, cmask, cvalid, ckind, cadd_keypad)
    r = x1 + jnp.dot(a2.reshape(B, T, D), cow) + cob
    if ff_params is not None:
        w1, b1, w2, b2, g2, be2, g3, be3 = ff_params
        x2 = _ln(r, g2, be2)
        h = jax.nn.gelu(jnp.dot(x2, w1) + b1, approximate=False)
        r = _ln(x2 + jnp.dot(h, w2) + b2, g3, be3)
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_decoder_selfcross(x, memory, params, masks, ff_params=None,
                            skind="repeat-inc", sadd_keypad=False,
                            ckind="all", cadd_keypad=False, heads=8,
                            attn_int8=False):
    """Decoder self-attn + LN1 + cross-attn (+ residuals) as ONE kernel;
    with ``ff_params`` = (w1, b1, w2, b2, g2, be2, g3, be3) the FF tail
    (LN2 -> FF -> residual -> LN3) fuses in too — a WHOLE decoder layer.

    ``params`` = (self q/k/v/o w+b x8, cross q/k/v/o w+b x8, g1, be1);
    ``masks`` = (self_mask, self_valid, cross_mask, cross_valid).
    ``attn_int8`` runs all eight projections int8-on-MXU (serving;
    incompatible with ff_params)."""
    smask, svalid, cmask, cvalid = masks
    return _dec_fwd_pallas(x, memory, params, smask, svalid, cmask,
                           cvalid, skind, sadd_keypad, ckind, cadd_keypad,
                           heads, ff_params, attn_int8)


def _dec_vjp_fwd(x, memory, params, masks, ff_params, skind, sadd_keypad,
                 ckind, cadd_keypad, heads, attn_int8):
    return (fused_decoder_selfcross(x, memory, params, masks, ff_params,
                                    skind, sadd_keypad, ckind,
                                    cadd_keypad, heads, attn_int8),
            (x, memory, params, masks, ff_params))


def _dec_vjp_bwd(skind, sadd_keypad, ckind, cadd_keypad, heads, attn_int8,
                 res, g):
    x, memory, params, masks, ff_params = res
    smask, svalid, cmask, cvalid = masks

    if ff_params is None:
        def ref(x_, memory_, params_):
            return decoder_selfcross_reference(
                x_, memory_, params_, smask, svalid, cmask, cvalid,
                skind, sadd_keypad, ckind, cadd_keypad, heads)
        _, vjp = jax.vjp(ref, x, memory, params)
        dx, dmem, dparams = vjp(g)
        dff = None
    else:
        def ref(x_, memory_, params_, ff_):
            return decoder_selfcross_reference(
                x_, memory_, params_, smask, svalid, cmask, cvalid,
                skind, sadd_keypad, ckind, cadd_keypad, heads, ff_)
        _, vjp = jax.vjp(ref, x, memory, params, ff_params)
        dx, dmem, dparams, dff = vjp(g)
    return dx, dmem, dparams, (None, None, None, None), dff


fused_decoder_selfcross.defvjp(_dec_vjp_fwd, _dec_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_encoder_layer(x, params, masks, kind="repeat-inc",
                        add_keypad=False, heads=8, ff_int8=False,
                        attn_int8=False):
    """One whole torch-style encoder layer as ONE Pallas kernel.

    ``params`` = (wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2,
    g1, be1, g2, be2); ``masks`` = (frame_mask, valid | None).
    ``ff_int8`` runs the FF matmuls int8-on-MXU with in-kernel dynamic
    activation scales (serving; gradients follow the float reference);
    ``attn_int8`` extends that to the q/k/v/out projections (the
    attention core stays float)."""
    mask, valid = masks
    return _enc_fwd_pallas(x, params, mask, valid, kind, add_keypad,
                           heads, ff_int8, attn_int8)


def _enc_vjp_fwd(x, params, masks, kind, add_keypad, heads, ff_int8,
                 attn_int8):
    return (fused_encoder_layer(x, params, masks, kind, add_keypad,
                                heads, ff_int8, attn_int8),
            (x, params, masks))


def _enc_vjp_bwd(kind, add_keypad, heads, ff_int8, attn_int8, res, g):
    x, params, masks = res
    mask, valid = masks

    def ref(x_, params_):
        return encoder_layer_reference(x_, params_, mask, valid, kind,
                                       add_keypad, heads)

    _, vjp = jax.vjp(ref, x, params)
    dx, dparams = vjp(g)
    return dx, dparams, (None, None)


fused_encoder_layer.defvjp(_enc_vjp_fwd, _enc_vjp_bwd)
