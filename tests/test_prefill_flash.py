"""Parity tests for the Pallas chunked-prefill flash kernel
(ops/pallas/prefill_flash.py) against a full-softmax reference, in
interpret mode on CPU. Covers: offsets, dynamic kv_len, padded tail
chunks (the l==0 NaN guard), sliding window, GQA head mapping, and
per-lane offsets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palu_tpu.ops.pallas.prefill_flash import prefill_flash


def ref_attn(q, k, v, q_offset, kv_len, sliding_window=None):
    """Full-softmax reference. q: (B, nh, Cq, hd); k/v: (B, nkv, S, hd)."""
    b, nh, cq, hd = q.shape
    nkv, s = k.shape[1], k.shape[2]
    rep = nh // nkv
    k = np.repeat(np.asarray(k, np.float32), rep, axis=1)
    v = np.repeat(np.asarray(v, np.float32), rep, axis=1)
    q = np.asarray(q, np.float32)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    pos = np.arange(s)[None, None, None, :]
    q_pos = (np.asarray(q_offset)[:, None, None, None]
             + np.arange(cq)[None, None, :, None])
    valid = (pos <= q_pos) & (pos < np.asarray(kv_len)[:, None, None, None])
    if sliding_window is not None:
        valid &= pos > q_pos - sliding_window
    logits = np.where(valid, logits, -1e30)
    logits -= logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p = np.where(valid, p, 0.0)
    denom = p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v) / np.maximum(denom, 1e-30)


def make_inputs(b=1, nh=4, nkv=4, cq=64, s_max=256, hd=64, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, nh, cq, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, nkv, s_max, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, nkv, s_max, hd), jnp.float32)
    return q, k, v


def run(q, k, v, off, kvl, **kw):
    return prefill_flash(
        q, k, v, jnp.asarray(off, jnp.int32), jnp.asarray(kvl, jnp.int32),
        block_s=kw.pop("block_s", 64), interpret=True,
        compute_dtype=kw.pop("compute_dtype", jnp.float32), **kw,
    )


def test_first_chunk_no_offset():
    q, k, v = make_inputs()
    out = run(q, k, v, [0], [64])
    ref = ref_attn(q, k, v, [0], [64])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_mid_chunk_offset():
    # second chunk of a prompt: q rows at absolute 64..127, cache holds 128
    q, k, v = make_inputs()
    out = run(q, k, v, [64], [128])
    ref = ref_attn(q, k, v, [64], [128])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_kv_len_not_block_multiple():
    q, k, v = make_inputs()
    out = run(q, k, v, [33], [97])
    ref = ref_attn(q, k, v, [33], [97])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_padded_tail_chunk_no_nan():
    # real prompt ends mid-chunk: kv_len < q_offset + cq. Rows past the end
    # are garbage but must be finite (the l==0 guard); in-range rows exact.
    q, k, v = make_inputs()
    off, kvl = 64, 80  # rows 0..15 real, 16..63 padding
    out = np.asarray(run(q, k, v, [off], [kvl]))
    assert np.isfinite(out).all()
    ref = ref_attn(q, k, v, [off], [kvl])
    np.testing.assert_allclose(out[:, :, :16], ref[:, :, :16],
                               rtol=2e-5, atol=2e-5)


def test_sliding_window():
    q, k, v = make_inputs()
    out = run(q, k, v, [128], [192], sliding_window=48)
    ref = ref_attn(q, k, v, [128], [192], sliding_window=48)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_gqa_head_mapping():
    q, k, v = make_inputs(nh=8, nkv=2)
    out = run(q, k, v, [64], [128])
    ref = ref_attn(q, k, v, [64], [128])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_per_lane_offsets():
    q, k, v = make_inputs(b=3)
    off, kvl = [0, 64, 128], [64, 128, 192]
    out = run(q, k, v, off, kvl)
    ref = ref_attn(q, k, v, off, kvl)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_bf16_compute():
    q, k, v = make_inputs()
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = run(q, k, v, [64], [128], compute_dtype=jnp.bfloat16)
    ref = ref_attn(q, k, v, [64], [128])
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("off,kvl,window", [
    (0, 64, None),          # first chunk
    (128, 192, None),       # mid chunk with offset
    (128, 150, None),       # kv_len not a block multiple
    (128, 192, 80),         # sliding window
])
def test_pipelined_matches_default(off, kvl, window):
    """The one-block-lag software pipeline is the same math evaluated a
    grid step later: parity with the unpipelined kernel and the
    full-softmax reference at every mask/offset shape."""
    q, k, v = make_inputs(seed=9)
    a = np.asarray(run(q, k, v, [off], [kvl], sliding_window=window))
    b = np.asarray(run(q, k, v, [off], [kvl], sliding_window=window,
                       pipelined=True))
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
    ref = ref_attn(q, k, v, [off], [kvl], sliding_window=window)
    np.testing.assert_allclose(b, ref, atol=2e-3, rtol=1e-3)


def test_pipelined_gqa_per_lane_and_padded_tail():
    q, k, v = make_inputs(b=2, nh=8, nkv=2, seed=10)
    off = [0, 64]
    kvl = [64, 128]
    a = np.asarray(run(q, k, v, off, kvl))
    b = np.asarray(run(q, k, v, off, kvl, pipelined=True))
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
    # padded tail (kv_len < q_off): finite garbage, no NaN
    out = np.asarray(run(q, k, v, [192, 192], [8, 8], pipelined=True))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("pipelined", [False, True])
def test_exp2_matches_exp(pipelined):
    """exp2 with the folded log2(e) scale is the identical softmax (the
    constant commutes through max/subtract): parity to f32 rounding."""
    q, k, v = make_inputs(seed=11)
    a = np.asarray(run(q, k, v, [128], [192], pipelined=pipelined))
    b = np.asarray(run(q, k, v, [128], [192], pipelined=pipelined,
                       exp2=True))
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=2e-5)
