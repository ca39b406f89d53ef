#!/usr/bin/env python
"""Count-kernel scaling methodology: device-mesh and process scaling.

Measures the psum-merged sharded count kernel (the hot reduction of every
query, reference bgt.c:735-757) across
  - 1/2/4/8 virtual devices in one process (weak + strong scaling), and
  - 1 vs 2 jax.distributed processes over one mesh (the multi-host seam),
then prints ONE JSON line: per-config throughput and parallel efficiency.

On this harness the "devices" are XLA host-platform virtual devices sharing
the machine's physical cores, so the efficiencies measure collective +
partitioning overhead of the sharded program, NOT hardware scaling; on a
real TPU slice the same code maps each shard to a chip and the psum rides
ICI (the BASELINE north star, >=80% to 2 hosts, needs that hardware).
The numbers establish the measurement method and the software overhead
floor.
"""

import json
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEV_RUNNER = r"""
import os, sys, time
n_dev = int(sys.argv[1]); words = int(sys.argv[2]); rows = int(sys.argv[3])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, REPO)
import numpy as np
from bgt_tpu.parallel import mesh as meshlib
mesh = meshlib.make_mesh()
rng = np.random.default_rng(0)
p0 = rng.integers(0, 2**32, (rows, words), dtype=np.uint32)
p1 = rng.integers(0, 2**32, (rows, words), dtype=np.uint32)
masks = rng.integers(0, 2**32, (2, words), dtype=np.uint32)
d0, d1, dm = meshlib.shard_planes(mesh, p0, p1, masks)
fn = meshlib.sharded_count_range_fn(mesh)
out = fn(d0, d1, dm, 0, rows); out.block_until_ready()
best = float("inf")
for _ in range(5):
    t0 = time.time()
    for _ in range(10):
        out = fn(d0, d1, dm, 0, rows)
    out.block_until_ready()
    best = min(best, (time.time() - t0) / 10)
print(f"RESULT {best:.6f}", flush=True)
"""

PROC_RUNNER = r"""
import os, sys, time
pid = int(sys.argv[1]); n_proc = int(sys.argv[2]); port = sys.argv[3]
dev_per_proc = int(sys.argv[4]); words_total = int(sys.argv[5])
rows = int(sys.argv[6])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_per_proc}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
if n_proc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=n_proc, process_id=pid)
sys.path.insert(0, REPO)
import numpy as np
from bgt_tpu.parallel import distributed, mesh as meshlib
mesh = distributed.global_mesh()
n_dev = mesh.devices.size
words = meshlib.pad_words_for_mesh(words_total, n_dev)
rng = np.random.default_rng(0)
full0 = rng.integers(0, 2**32, (rows, words), dtype=np.uint32)
full1 = rng.integers(0, 2**32, (rows, words), dtype=np.uint32)
masks = rng.integers(0, 2**32, (2, words), dtype=np.uint32)
lo, hi = distributed.local_column_range(words, mesh)
p0 = distributed.place_local(mesh, full0[:, lo:hi])
p1 = distributed.place_local(mesh, full1[:, lo:hi])
mk = distributed.place_local(mesh, masks[:, lo:hi])
fn = meshlib.sharded_count_range_fn(mesh)
out = fn(p0, p1, mk, 0, rows); out.block_until_ready()
best = float("inf")
for _ in range(5):
    t0 = time.time()
    for _ in range(10):
        out = fn(p0, p1, mk, 0, rows)
    out.block_until_ready()
    best = min(best, (time.time() - t0) / 10)
if pid == 0:
    print(f"RESULT {best:.6f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _clean_env():
    return {k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}


def _parse(out: str) -> float:
    m = re.search(r"RESULT ([0-9.eE+-]+)", out)
    if not m:
        raise RuntimeError(f"no RESULT in: {out[-500:]}")
    return float(m.group(1))


def run_device(n_dev: int, words: int, rows: int) -> float:
    script = f"REPO = {str(REPO)!r}\n" + DEV_RUNNER
    res = subprocess.run(
        [sys.executable, "-c", script, str(n_dev), str(words), str(rows)],
        env=_clean_env(), capture_output=True, text=True, timeout=600)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-800:])
    return _parse(res.stdout)


def run_procs(n_proc: int, total_devices: int, words: int, rows: int) -> float:
    port = str(_free_port())
    script = f"REPO = {str(REPO)!r}\n" + PROC_RUNNER
    dev_per_proc = total_devices // n_proc
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid), str(n_proc),
                          port, str(dev_per_proc), str(words), str(rows)],
                         env=_clean_env(), stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(n_proc)
    ]
    out0 = ""
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(err[-800:])
        if pid == 0:
            out0 = out
    return _parse(out0)


def main() -> dict:
    rows = 8192
    base_words = 256  # per-device column width for weak scaling
    result: dict = {
        "method": "sharded count kernel (psum over sample axis); "
                  "best-of-5 x 10 iters; virtual CPU devices measure "
                  "software overhead, not hardware scaling (see tool doc)",
        "rows": rows,
    }
    # weak scaling: constant words per device
    weak = {}
    t1 = None
    for n in (1, 2, 4, 8):
        t = run_device(n, base_words * n, rows)
        gt = rows * base_words * n * 32
        e = {"s_per_iter": round(t, 6),
             "gcounts_per_s": round(gt / t / 1e9, 2)}
        if n == 1:
            t1 = t
        else:
            e["efficiency"] = round(t1 / t, 3)
        weak[str(n)] = e
    result["weak_devices"] = weak
    # strong scaling: fixed total width
    strong = {}
    t1 = None
    for n in (1, 2, 4, 8):
        t = run_device(n, 2048, rows)
        e = {"s_per_iter": round(t, 6)}
        if n == 1:
            t1 = t
        else:
            e["efficiency"] = round(t1 / (t * n), 3)
        strong[str(n)] = e
    result["strong_devices"] = strong
    # process scaling (the multi-host seam): 1 vs 2 processes, 8 devices
    try:
        tp1 = run_procs(1, 8, 2048, rows)
        tp2 = run_procs(2, 8, 2048, rows)
        result["processes"] = {
            "1": {"s_per_iter": round(tp1, 6)},
            "2": {"s_per_iter": round(tp2, 6),
                  "efficiency": round(tp1 / tp2, 3)},
        }
    except (RuntimeError, subprocess.TimeoutExpired) as e:
        result["processes"] = {"error": str(e)[:200]}
    return result


if __name__ == "__main__":
    print(json.dumps({"scaling": main()}))
