"""Contract tests for the shared block pipeline (kernels/pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels.collide_stream import HALO
from lbm_tpu.kernels.pipeline import make_block_pipeline, resolve_block_rows


def test_single_input_identity_and_halo():
    """Body sees the wrapped halo rows and the right absolute indices."""
    R, C = 32, 128

    def body(block, abs_iota, i):
        rows = block.shape[1]
        # return interior + the halo's first row value folded in, to prove
        # the halo carries the periodic wrap of the PREVIOUS block
        return block[:, HALO:rows - HALO, :] + block[:, :1, :] * 0.0

    step = make_block_pipeline(3, R, C, body, block_rows=8, interpret=True)
    x = jnp.arange(3 * R * C, dtype=jnp.float32).reshape(3, R, C)
    np.testing.assert_array_equal(np.asarray(step(x)), np.asarray(x))


def test_multi_input_and_planes_out():
    """Two inputs with different plane counts; reduced output planes."""
    R, C = 32, 128

    def body(a, b, abs_iota, i):
        rows = a.shape[1]
        out = a[0] + 2.0 * b[0] + 0.0 * abs_iota
        return out[None, HALO:rows - HALO, :]

    step = make_block_pipeline((2, 1), R, C, body, planes_out=1,
                               block_rows=8, interpret=True)
    a = jnp.ones((2, R, C), jnp.float32) * 3.0
    b = jnp.ones((1, R, C), jnp.float32) * 5.0
    np.testing.assert_allclose(np.asarray(step(a, b)), 13.0)


def test_abs_iota_is_unwrapped():
    """abs_iota passes raw global row indices (halo rows go negative)."""
    R, C = 32, 128
    seen = {}

    def body(block, abs_iota, i):
        rows = block.shape[1]
        # write the absolute index into the output for checking
        return jnp.broadcast_to(abs_iota[HALO:rows - HALO, :],
                                (1, rows - 2 * HALO, C)).astype(jnp.float32)

    step = make_block_pipeline(1, R, C, body, block_rows=8, interpret=True)
    out = np.asarray(step(jnp.zeros((1, R, C), jnp.float32)))
    np.testing.assert_array_equal(out[0, :, 0], np.arange(R))


def test_resolve_block_rows_rules():
    # C=2048 f32: 64-row blocks fill the SAFE_SCOPE-scaled budget
    assert resolve_block_rows((9,), 9, 4096, 2048, jnp.float32,
                              10 * 2 ** 20, None, False) == 64
    with pytest.raises(ValueError, match="not divisible"):
        resolve_block_rows((9,), 9, 30, 128, jnp.float32,
                           10 * 2 ** 20, 8, False)
    with pytest.raises(ValueError, match="multiple of 128"):
        resolve_block_rows((9,), 9, 32, 100, jnp.float32,
                           10 * 2 ** 20, 8, False)
    # alias opt-out admits B + 16 > R
    assert resolve_block_rows((9,), 9, 16, 128, jnp.float32,
                              10 * 2 ** 20, 8, True) == 8


def test_resolve_block_rows_alias_aware_picks():
    # non-power-of-two grids: auto-picks must stay multiples of 8 (DMA
    # alignment promise pl.multiple_of(i*B, 8)) AND alias-free — the old
    # post-pick halving produced 28-row blocks here
    b = resolve_block_rows((9,), 9, 56, 128, jnp.float32,
                           10 * 2 ** 20, None, False)
    assert b % 8 == 0 and b + 16 <= 56
    assert resolve_block_rows((9,), 9, 120, 128, jnp.float32,
                              10 * 2 ** 20, None, False) == 40
    # C=4096 is admissible under the SAFE_SCOPE lift (the old 256 KiB
    # plane ceiling rejected it); the budget caps the block instead
    assert resolve_block_rows((9,), 9, 4096, 4096, jnp.float32,
                              10 * 2 ** 20, None, True) == 32
    # columns so wide even B=8 slabs blow the budget: clear error, not
    # a bogus fallback that dies inside Mosaic
    with pytest.raises(ValueError, match="no legal block"):
        resolve_block_rows((9,), 9, 4096, 16384, jnp.float32,
                           10 * 2 ** 20, None, True)
    # R too small for any alias-free slab
    with pytest.raises(ValueError, match="no legal block"):
        resolve_block_rows((9,), 9, 16, 128, jnp.float32,
                           10 * 2 ** 20, None, False)


def test_channel_picker_stays_aligned():
    # the channel kernel's old pick-then-halve produced B=60 at R=120
    from lbm_tpu.kernels.channel_pallas import make_channel_fused_step

    step = make_channel_fused_step(120, 128, 1.0, 1.01, 1.0,
                                   interpret=True)
    f = jnp.ones((9, 120, 128), jnp.float32) / 9.0
    out = np.asarray(step(f))
    assert np.isfinite(out).all()
