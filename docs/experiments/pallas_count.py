"""Fusion-control experiment: hand-tiled Pallas count kernel (width-dependent).

Finding (v5e, bench shape 105730 rows x 157 uint32 words, <=32 groups):
the XLA fusion of ops.counts.count_codes runs the whole unrolled
bitwise+popcount+reduce in ONE pass over the planes at ~2.3 TB/s
effective (0.057 ms warm, independent of group count), while this
hand-tiled Pallas version is orders of magnitude slower because the
157-word row width fights the (8,128) VPU tiling.

REVERSED at production width (r5): at the lane-aligned 2048-word HRC row
width a row-tiled Pallas kernel reaches 721 GB/s device-side (~88% of
v5e HBM peak) vs 514 GB/s for the fusion — `tools/probe_roofline.py`
holds the measured comparison, and `ops/counts.py:_count_codes_pallas`
is the production path on TPU at qualifying shapes (words % 128 == 0),
with the fusion as oracle and fallback.  This file keeps the original
narrow-width control.  Run directly: python docs/experiments/pallas_count.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Pallas TPU kernel: fused count over row tiles
# ---------------------------------------------------------------------------

def _count_kernel(p0_ref, p1_ref, mask_ref, out_ref, *, n_groups):
    # out layout: (row_tile, 128) int32 with group gi's [cnt0,cnt1,cnt2,cnt3]
    # at lanes 4*gi..4*gi+3 — lane-aligned so stores tile cleanly on the VPU
    import jax.lax as lax
    p0 = p0_ref[:]
    p1 = p1_ref[:]
    pc = lax.population_count
    both = p0 & p1
    cols = []
    for gi in range(n_groups):
        m = mask_ref[gi, :][None, :]
        n10 = pc(p0 & m).sum(axis=1, dtype=jnp.int32)
        n11 = pc(p1 & m).sum(axis=1, dtype=jnp.int32)
        nb = pc(both & m).sum(axis=1, dtype=jnp.int32)
        tot = pc(m).sum(dtype=jnp.int32)
        cnt1 = n10 - nb
        cnt2 = n11 - nb
        cnt0 = tot - cnt1 - cnt2 - nb
        cols += [cnt0, cnt1, cnt2, nb]
    while len(cols) < 128:
        cols.append(jnp.zeros_like(cols[0]))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def count_codes_pallas(p0, p1, masks, row_tile: int = 512):
    """Pallas version of count_codes (explicit row-tiled single HBM pass).

    Measured on v5e: the XLA fusion of :func:`count_codes` runs this
    bitwise+popcount+reduce at HBM speed of light (~0.04ms for 16k rows x
    160 words), while this hand-tiled kernel is orders of magnitude slower
    because the 160-word row width fights the (8,128) VPU tiling.  The jnp
    formulation is therefore the production path; this kernel is kept as
    the fusion-control experiment documenting that finding.  Groups <= 32.
    """
    import functools as ft

    from jax.experimental import pallas as pl

    rows, words = p0.shape
    g = masks.shape[0]
    assert g <= 32
    pad = (-rows) % row_tile
    if pad:
        p0 = jnp.pad(p0, ((0, pad), (0, 0)))
        p1 = jnp.pad(p1, ((0, pad), (0, 0)))
    grid = ((rows + pad) // row_tile,)
    lanes = 128
    out = pl.pallas_call(
        ft.partial(_count_kernel, n_groups=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, words), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, words), lambda i: (i, 0)),
            pl.BlockSpec((g, words), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(((rows + pad), lanes), jnp.int32),
    )(p0, p1, masks)
    return out[:rows, : 4 * g].reshape(rows, g, 4)




if __name__ == "__main__":
    import time
    from bgt_tpu.ops import counts as counts_ops
    rng = np.random.default_rng(0)
    rows, words, g = 16384, 160, 2
    p0 = jnp.asarray(rng.integers(0, 2**32, (rows, words), dtype=np.uint32))
    p1 = jnp.asarray(rng.integers(0, 2**32, (rows, words), dtype=np.uint32))
    masks = jnp.asarray(rng.integers(0, 2**32, (g, words), dtype=np.uint32))
    ref = counts_ops.count_codes(p0, p1, masks)
    got = count_codes_pallas(np.asarray(p0), np.asarray(p1), np.asarray(masks))
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    for fn, name in ((lambda: counts_ops.count_codes(p0, p1, masks), "xla"),
                     (lambda: count_codes_pallas(p0, p1, masks), "pallas")):
        fn()
        t0 = time.time()
        for _ in range(5):
            r = fn()
        jax.block_until_ready(r)
        print(f"{name}: {(time.time() - t0) / 5 * 1e3:.3f} ms")
