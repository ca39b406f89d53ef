"""Device kernels: masked popcount genotype counting and code decode.

The hot reduction of every query — per-site counts of the four genotype
codes over the selected haplotype columns, overall and per sample group
(reference bgt.c:735-757) — formulated as bitwise ops + popcounts over the
packed planes so XLA keeps the whole thing in registers/VPU:

    n1_0 = popcount(p0 & mask)        # code 1 or 3 (low bit set)
    n1_1 = popcount(p1 & mask)        # code 2 or 3 (high bit set)
    n11  = popcount(p0 & p1 & mask)   # code 3
    cnt1 = n1_0 - n11; cnt2 = n1_1 - n11; cnt3 = n11
    cnt0 = popcount(mask) - cnt1 - cnt2 - cnt3

AN = cnt0+cnt1+cnt3, AC1 = cnt1, AC2 = cnt3 (bgt.c:746-756).

Production path: a hand-tiled Pallas kernel on TPU at production shapes
(measured 721 GB/s device-side on v5e at the HRC width — ~88% of the
819 GB/s nominal HBM peak, matching a popcount-reduce bandwidth proxy),
with the XLA fusion (~490 GB/s) as the oracle and the fallback for other
backends/shapes; bench.py records per-run roofline_frac.  An earlier
narrow-row experiment where the fusion won is preserved in
docs/experiments/pallas_count.py.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-compile (~1-2 min on TPU) is
    paid once per machine, not once per process.  BGT_TPU_JAX_CACHE overrides
    the location; set it to "off" to disable."""
    loc = os.environ.get("BGT_TPU_JAX_CACHE")
    if loc == "off":
        return
    if not loc:
        loc = str(Path(__file__).resolve().parent.parent.parent
                  / "build" / "jaxcache")
    try:
        Path(loc).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_setup_compilation_cache()

_warmed = [False]


def warmup_transfers_async() -> None:
    """Fire-and-forget device-transfer warmup.

    Tunneled TPUs (axon) pay a multi-minute penalty on the FIRST
    device->host transfer of a process (measured: 57-330s for the first
    readback, ~0.1ms after).  Long-lived processes (the query server) call
    this at startup so the channel is warm before the first real query
    needs a readback.  No-op on failure or missing accelerator.
    """
    if _warmed[0]:
        return
    _warmed[0] = True
    import threading

    def _go():
        try:
            np.asarray(jnp.arange(8, dtype=jnp.int32) + 1)
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    threading.Thread(target=_go, daemon=True, name="bgt-d2h-warmup").start()


@jax.jit
def _count_codes_jnp(p0: jax.Array, p1: jax.Array, masks: jax.Array) -> jax.Array:
    """XLA-fusion formulation of the masked-popcount count (the oracle and
    the fallback for shapes/backends the Pallas kernel does not cover).

    Groups are unrolled statically (<=33) so no (rows, groups, words)
    intermediate is ever materialized; XLA:TPU fuses the unroll into one
    pass over the planes.
    """
    pc = jax.lax.population_count
    both = p0 & p1
    per_group = []
    for gi in range(masks.shape[0]):
        m = masks[gi][None, :]
        n10 = pc(p0 & m).sum(axis=-1, dtype=jnp.int32)
        n11 = pc(p1 & m).sum(axis=-1, dtype=jnp.int32)
        nb = pc(both & m).sum(axis=-1, dtype=jnp.int32)
        tot = pc(masks[gi]).sum(dtype=jnp.int32)
        cnt1 = n10 - nb
        cnt2 = n11 - nb
        cnt0 = tot - cnt1 - cnt2 - nb
        per_group.append(jnp.stack([cnt0, cnt1, cnt2, nb], axis=-1))
    return jnp.stack(per_group, axis=1)


_PALLAS_TILE = 256  # rows per grid step: 32 (8,128)-sublane tiles of uint32


def _count3_kernel(p0_ref, p1_ref, m_ref, out_ref, *, g: int):
    """Pallas body: one row tile, all groups, three popcount streams.

    Emits the raw sums (n10, n11, nb) per group at lanes 3*gi..3*gi+2; the
    cheap affine transform to (cnt0..cnt3) runs outside the kernel on the
    tiny (rows, g, 3) result.  3*g <= 128 lanes by the dispatcher gate.
    """
    pc = jax.lax.population_count
    a = p0_ref[...]
    b = p1_ref[...]
    cols = []
    for gi in range(g):
        m = m_ref[gi][None, :]
        am = a & m
        bm = b & m
        cols.append(pc(am).view(jnp.int32).sum(axis=1))
        cols.append(pc(bm).view(jnp.int32).sum(axis=1))
        cols.append(pc(am & bm).view(jnp.int32).sum(axis=1))
    z = jnp.zeros_like(cols[0])
    while len(cols) < 128:
        cols.append(z)
    out_ref[...] = jnp.stack(cols, axis=1)


_PALLAS_GROUP_CHUNK = 8


@jax.jit
def _count_codes_pallas(p0, p1, masks):
    """Hand-tiled single-HBM-pass count kernel.

    Measured (TPU v5e, 30000x2048 words): 707 GB/s device-side vs 514 GB/s
    for the XLA fusion and 709 GB/s for a popcount-reduce HBM proxy — i.e.
    at the measured memory roofline (~86% of the 819 GB/s nominal peak);
    tools/probe_roofline.py reproduces the comparison.  (An earlier
    experiment at 157-word rows concluded Pallas loses to the fusion —
    true at that width, reversed at production width; kept in
    docs/experiments/pallas_count.py.)

    Groups run in chunks of <=8 per pallas_call: Mosaic's scoped-VMEM
    footprint grows with the unrolled group count (a 33-group unroll
    blew the 16 MB limit at narrow word widths — caught by the
    real-backend device suite), and a multi-pass chunked kernel still
    matches the compute-bound fused alternative at high group counts.
    """
    from jax.experimental import pallas as pl

    rows, words = p0.shape
    g = masks.shape[0]
    # row tile sized to the ~16 MB scoped-VMEM budget: measured footprint
    # at (256, 2048) words was ~8 * tile * words * 4 bytes (double-buffered
    # planes + unrolled popcount temporaries), so budget 12 MB with a 10x
    # coefficient and round down to the 8-row sublane
    tile = min(_PALLAS_TILE,
               max(8, (12 << 20) // (10 * words * 4) // 8 * 8))
    grid = (pl.cdiv(rows, tile),)
    chunks = []
    for lo in range(0, g, _PALLAS_GROUP_CHUNK):
        mc = masks[lo: lo + _PALLAS_GROUP_CHUNK]
        gc = mc.shape[0]
        out = pl.pallas_call(
            functools.partial(_count3_kernel, g=gc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, words), lambda i: (i, 0)),
                pl.BlockSpec((tile, words), lambda i: (i, 0)),
                pl.BlockSpec((gc, words), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        )(p0, p1, mc)
        chunks.append(out[:, : 3 * gc])
    raw = jnp.concatenate(chunks, axis=1).reshape(rows, g, 3)
    n10 = raw[..., 0]
    n11 = raw[..., 1]
    nb = raw[..., 2]
    tot = jax.lax.population_count(masks).sum(axis=-1, dtype=jnp.int32)
    cnt1 = n10 - nb
    cnt2 = n11 - nb
    cnt0 = tot[None, :] - cnt1 - cnt2 - nb
    return jnp.stack([cnt0, cnt1, cnt2, nb], axis=-1)


def _use_pallas(rows: int, words: int, g: int) -> bool:
    """Shape/backend gate for the Pallas path: TPU backend, lane-aligned
    word width, enough rows to fill a tile, and 3*g raw sums fitting the
    128-lane output block.  Width >= 1024 keeps the 128-lane-padded raw
    output (512 B/row/chunk, the minimum Mosaic block width) under ~12%
    extra HBM write traffic — at narrow widths the padding would rival the
    planes themselves and the XLA fusion wins anyway.
    BGT_TPU_PALLAS=0 forces the XLA fusion."""
    if os.environ.get("BGT_TPU_PALLAS", "1") == "0":
        return False
    if words % 128 != 0 or words < 1024 or rows < _PALLAS_TILE \
            or 3 * g > 128:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def count_codes(p0: jax.Array, p1: jax.Array, masks: jax.Array) -> jax.Array:
    """Per-row, per-group genotype-code counts.

    p0, p1: (rows, words) uint32 packed planes.
    masks:  (groups, words) uint32 column masks.
    returns (rows, groups, 4) int32: counts of codes 0..3.

    Dispatches to the Pallas single-pass kernel on TPU at production
    shapes (~707 GB/s device-side at the HRC width, ~86% of HBM peak) and
    to the XLA fusion elsewhere; both compute identical int32 counts
    (cross-checked in tests/test_ops.py and the real-backend device suite).
    Shapes are static under tracing, so this dispatch also works inside
    shard_map bodies (parallel/mesh.py).
    """
    rows, words = p0.shape
    if _use_pallas(int(rows), int(words), int(masks.shape[0])):
        return _count_codes_pallas(p0, p1, masks)
    return _count_codes_jnp(p0, p1, masks)


@functools.partial(jax.jit, static_argnames=("length",))
def count_codes_range(p0, p1, masks, start, length: int):
    """count_codes over a device-resident row slice [start, start+length)."""
    s0 = jax.lax.dynamic_slice_in_dim(p0, start, length, axis=0)
    s1 = jax.lax.dynamic_slice_in_dim(p1, start, length, axis=0)
    return count_codes(s0, s1, masks)


@functools.partial(jax.jit, static_argnames=("length", "n_out"))
def gather_codes_range(p0, p1, cols, start, length: int, n_out: int):
    """Decode + column-subset a device-resident row slice."""
    s0 = jax.lax.dynamic_slice_in_dim(p0, start, length, axis=0)
    s1 = jax.lax.dynamic_slice_in_dim(p1, start, length, axis=0)
    codes = decode_codes(s0, s1)
    return jnp.take(codes, cols, axis=1)


@functools.partial(jax.jit, static_argnames=("length",))
def gt_pair_idx_range(p0, p1, cols, start, length: int):
    """Diploid GT cell indices for a row slice: code(hap0)*4+code(hap1).

    The full decode + column subset + pairing runs on device; the readback
    is one uint8 per sample per site (the direct input to the 16-entry text
    cell LUT).
    """
    s0 = jax.lax.dynamic_slice_in_dim(p0, start, length, axis=0)
    s1 = jax.lax.dynamic_slice_in_dim(p1, start, length, axis=0)
    codes = decode_codes(s0, s1)
    sub = jnp.take(codes, cols, axis=1)
    return (sub[:, 0::2] << 2) | sub[:, 1::2]


def site_stats(counts: jax.Array) -> dict:
    """AN/AC vectors from (rows, groups, 4) counts (bgtm_cal_info)."""
    tot = counts.sum(axis=1)  # (rows, 4)
    out = {
        "AN": tot[:, 0] + tot[:, 1] + tot[:, 3],
        "AC": tot[:, 1],
        "AC_M": tot[:, 3],
    }
    n_groups = counts.shape[1]
    if n_groups > 1:
        out["GAN"] = counts[:, :, 0] + counts[:, :, 1] + counts[:, :, 3]
        out["GAC"] = counts[:, :, 1]
        out["GAC_M"] = counts[:, :, 3]
    return out


@jax.jit
def decode_codes(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """(rows, words*32) uint8 genotype codes from packed planes."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b0 = (p0[:, :, None] >> shifts[None, None, :]) & 1
    b1 = (p1[:, :, None] >> shifts[None, None, :]) & 1
    codes = (b1 << 1) | b0
    return codes.reshape(p0.shape[0], -1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_out",))
def gather_codes(p0: jax.Array, p1: jax.Array, cols: jax.Array, n_out: int) -> jax.Array:
    """Decode and column-subset in one jit: (rows, n_out) uint8 codes."""
    codes = decode_codes(p0, p1)
    return jnp.take(codes, cols, axis=1)


def counts_to_numpy(counts) -> np.ndarray:
    return np.asarray(counts)
