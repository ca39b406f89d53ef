"""Roofline probe for the masked-popcount count kernel (VERDICT r4 next #1).

Times each formulation inside a single on-device ``fori_loop`` (one
dispatch for K passes) so tunnel/dispatch latency cannot pollute the
device-side number; the loop perturbs the mask per iteration to stop XLA
hoisting the body.  Run: python tools/probe_roofline.py [rows] [k]
Writes /tmp/roofline.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
WORDS = 2048
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def device_seconds_per_iter(loop_fn, *args):
    """Time K and 2K in-device iterations; the difference isolates per-iter
    device time from dispatch + fixed overhead."""
    lo = jax.jit(functools.partial(loop_fn, k=K))
    hi = jax.jit(functools.partial(loop_fn, k=2 * K))
    jax.block_until_ready(lo(*args))
    jax.block_until_ready(hi(*args))

    def best_of(f, n=3):
        b = float("inf")
        for _ in range(n):
            t0 = time.time()
            jax.block_until_ready(f(*args))
            b = min(b, time.time() - t0)
        return b

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max(t_hi - t_lo, 1e-9) / K


def main():
    dev = jax.devices()[0]
    res = {"backend": dev.platform, "device_kind": dev.device_kind,
           "rows": ROWS, "words": WORDS, "k": K}
    rng = np.random.default_rng(0)
    h0 = rng.integers(0, 2**32, (ROWS, WORDS), dtype=np.uint32)
    h1 = rng.integers(0, 2**32, (ROWS, WORDS), dtype=np.uint32)
    hm = rng.integers(0, 2**32, (32, WORDS), dtype=np.uint32)
    t0 = time.time()
    np.asarray(jnp.arange(8) + 1)  # first-readback warmup (tunnel penalty)
    res["first_readback_s"] = round(time.time() - t0, 2)
    p0 = jax.device_put(h0, dev)
    p1 = jax.device_put(h1, dev)
    m1 = jax.device_put(hm[:1], dev)
    m32 = jax.device_put(hm, dev)
    jax.block_until_ready((p0, p1, m32))
    plane_bytes = h0.nbytes * 2
    res["plane_bytes"] = plane_bytes

    def bw(name, loop_fn, *args, nbytes=plane_bytes):
        try:
            t = device_seconds_per_iter(loop_fn, *args)
            res[name] = {"s": round(t, 6), "gbs": round(nbytes / t / 1e9, 1)}
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": str(e)[:200]}
        print(name, res[name], flush=True)

    # --- HBM proxies (read-traffic GB/s) -------------------------------
    def loop_reduce2(p0, p1, k):
        def body(i, acc):
            x = p0 ^ i.astype(jnp.uint32)
            return acc + (x ^ p1).view(jnp.int32).sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    bw("proxy_reduce2", loop_reduce2, p0, p1)

    def loop_reduce1(p0, k):
        def body(i, acc):
            return acc + (p0 ^ i.astype(jnp.uint32)).view(jnp.int32) \
                .sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    bw("proxy_reduce1", loop_reduce1, p0, nbytes=h0.nbytes)

    def loop_popc1(p0, k):
        pc = jax.lax.population_count
        def body(i, acc):
            return acc + pc(p0 ^ i.astype(jnp.uint32)).view(jnp.int32) \
                .sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    bw("proxy_popc1", loop_popc1, p0, nbytes=h0.nbytes)

    # --- production formulation ---------------------------------------
    from bgt_tpu.ops import counts as C

    def mk_loop(count_fn):
        def loop(p0, p1, masks, k):
            def body(i, acc):
                m = masks ^ i.astype(jnp.uint32)
                out = count_fn(p0, p1, m)
                return acc + out.sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return loop

    prod = mk_loop(C.count_codes)
    bw("count_1mask", prod, p0, p1, m1)
    bw("count_32mask", prod, p0, p1, m32)

    # --- variant A: two-stage int16 partial accumulation ---------------
    def count_i16(p0, p1, masks):
        pc = jax.lax.population_count
        both = p0 & p1
        outs = []
        for gi in range(masks.shape[0]):
            m = masks[gi][None, :]
            def red(x):
                r = pc(x & m).astype(jnp.int16).reshape(ROWS, 128, 16)
                return r.sum(axis=-1).astype(jnp.int32).sum(axis=-1)
            n10, n11, nb = red(p0), red(p1), red(both)
            cnt1 = n10 - nb
            cnt2 = n11 - nb
            outs.append(jnp.stack([cnt1, cnt2, nb], axis=-1))
        return jnp.stack(outs, axis=1)
    bw("count_i16_1mask", mk_loop(count_i16), p0, p1, m1)

    # --- variant B: one-level reshape reduction ------------------------
    def count_reshape(p0, p1, masks):
        pc = jax.lax.population_count
        both = p0 & p1
        outs = []
        for gi in range(masks.shape[0]):
            m = masks[gi][None, :]
            def red(x):
                r = pc(x & m).view(jnp.int32).reshape(ROWS, 16, 128)
                return r.sum(axis=1).sum(axis=-1)
            n10, n11, nb = red(p0), red(p1), red(both)
            cnt1 = n10 - nb
            cnt2 = n11 - nb
            outs.append(jnp.stack([cnt1, cnt2, nb], axis=-1))
        return jnp.stack(outs, axis=1)
    bw("count_reshape_1mask", mk_loop(count_reshape), p0, p1, m1)

    # --- variant C: f32 matmul reduction on the MXU --------------------
    ones = jnp.ones((WORDS, 1), jnp.float32)

    def count_mm(p0, p1, masks):
        pc = jax.lax.population_count
        both = p0 & p1
        outs = []
        for gi in range(masks.shape[0]):
            m = masks[gi][None, :]
            def red(x):
                return (pc(x & m).astype(jnp.float32) @ ones)[:, 0]
            n10, n11, nb = red(p0), red(p1), red(both)
            cnt1 = n10 - nb
            cnt2 = n11 - nb
            outs.append(jnp.stack([cnt1, cnt2, nb], axis=-1)
                        .astype(jnp.int32))
        return jnp.stack(outs, axis=1)
    bw("count_mm_1mask", mk_loop(count_mm), p0, p1, m1)
    bw("count_mm_32mask", mk_loop(count_mm), p0, p1, m32)

    # --- variant D: single fused pass, 3 streams stacked ---------------
    # stack [p0&m, p1&m, both&m] then one popcount+reduce over the stack:
    # encourages a single traversal with 3 accumulators
    def count_stack(p0, p1, masks):
        pc = jax.lax.population_count
        both = p0 & p1
        outs = []
        for gi in range(masks.shape[0]):
            m = masks[gi][None, :]
            s = jnp.stack([p0 & m, p1 & m, both & m], axis=1)
            red = pc(s).view(jnp.int32).sum(axis=-1)
            n10, n11, nb = red[:, 0], red[:, 1], red[:, 2]
            cnt1 = n10 - nb
            cnt2 = n11 - nb
            outs.append(jnp.stack([cnt1, cnt2, nb], axis=-1))
        return jnp.stack(outs, axis=1)
    bw("count_stack_1mask", mk_loop(count_stack), p0, p1, m1)

    # --- variant E: Pallas row-tiled kernel -----------------------------
    try:
        from jax.experimental import pallas as pl

        def _kern(p0_ref, p1_ref, m_ref, out_ref):
            pc = jax.lax.population_count
            a = p0_ref[...]
            b = p1_ref[...]
            m = m_ref[...]
            am = a & m
            bm = b & m
            n10 = pc(am).view(jnp.int32).sum(axis=1)
            n11 = pc(bm).view(jnp.int32).sum(axis=1)
            nb = pc(am & bm).view(jnp.int32).sum(axis=1)
            z = jnp.zeros_like(n10)
            cols = [n10, n11, nb] + [z] * 125
            out_ref[...] = jnp.stack(cols, axis=1)

        def count_pallas(p0, p1, mask1, row_tile=256):
            rows, words = p0.shape
            grid = (rows // row_tile,)
            return pl.pallas_call(
                _kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((row_tile, words), lambda i: (i, 0)),
                    pl.BlockSpec((row_tile, words), lambda i: (i, 0)),
                    pl.BlockSpec((1, words), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((row_tile, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            )(p0, p1, mask1)

        rt_rows = (ROWS // 256) * 256
        pp0 = p0[:rt_rows]
        pp1 = p1[:rt_rows]

        def loop_pallas(p0, p1, m, k):
            def body(i, acc):
                out = count_pallas(p0, p1, m ^ i.astype(jnp.uint32))
                return acc + out.sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        bw("count_pallas_1mask", loop_pallas, pp0, pp1, m1,
           nbytes=2 * rt_rows * WORDS * 4)
    except Exception as e:  # noqa: BLE001
        res["count_pallas_1mask"] = {"error": str(e)[:300]}
        print("pallas failed:", str(e)[:300], flush=True)

    print(json.dumps(res))
    with open("/tmp/roofline.json", "w") as fp:
        json.dump(res, fp, indent=1)


if __name__ == "__main__":
    main()
