"""Worker for the real 2-process distributed test (spawned by
``test_multiprocess.py``): initializes ``jax.distributed`` on the CPU
backend (2 processes x 2 virtual devices, Gloo collectives), then drives
the multi-controller paths end-to-end:

- ``init_distributed`` down its REAL (non-no-op) branch;
- ``make_sharded_rows``: process-local ingest — the row reader is only
  ever asked for this process's shard rows (plus a 1-row dim probe);
- ``build_index_sharded`` over a mesh spanning BOTH processes, with the
  node table verified bit-equal to the single-device fused build;
- ``knn_global`` on that tree vs the exact oracle;
- ``build_index_multislice``: each process builds ONLY its own slice;
- ``knn_multislice`` / ``search_multislice``: cross-process
  ``process_allgather`` merge, verified against the oracle on BOTH
  processes;
- ``pack_database_sharded`` + ``sharded_scan_knn`` (full and pruned):
  the scan-serving all-gather merge crossing the process boundary.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vector_database_tpu import build_index_fused, exact_ball, exact_knn  # noqa: E402
from vector_database_tpu.parallel import (  # noqa: E402
    build_index_multislice,
    build_index_sharded,
    init_distributed,
    knn_global,
    knn_multislice,
    make_sharded_rows,
    search_multislice,
)

assert init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
) is True
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from jax.sharding import Mesh  # noqa: E402

mesh = Mesh(np.asarray(jax.devices()), ("data",))

rng = np.random.RandomState(3)
n = 203
full = rng.randint(-4, 5, size=(n, 6)).astype(np.float32)
# integer-valued data: f32 segment sums are order-independent, so the
# sharded tree must be BITWISE equal to the single-device one

asked = []


def reader(lo, hi):
    asked.append((lo, hi))
    return full[lo:hi]


rows = make_sharded_rows(reader, mesh, n=n)
n_loc = -(-n // 4)
lo_own = 2 * pid * n_loc
hi_own = min((2 * pid + 2) * n_loc, n)
for lo, hi in asked:
    if (lo, hi) == (0, 1):  # the dim probe
        continue
    assert lo >= lo_own and hi <= hi_own, (
        f"process {pid} asked for rows [{lo}, {hi}) outside its shard "
        f"span [{lo_own}, {hi_own})"
    )

idx = build_index_sharded(rows, mesh, leaf_size=2, stats_subsample=1)
si = build_index_fused(full, leaf_size=2, stats_subsample=1)
for f in ("dim", "mid", "low", "high"):
    a = np.asarray(getattr(si, f))
    b = np.asarray(getattr(idx, f))
    assert np.array_equal(a, b), f"2-process sharded build {f} mismatch"

q = full[:4]
_, ed2 = exact_knn(full, q, k=3)
radius = float(np.sqrt(np.max(np.asarray(ed2)))) + 0.1
r, d2 = knn_global(idx, q, k=3, radius=radius)
assert np.allclose(
    np.sort(np.asarray(d2), 1), np.sort(np.asarray(ed2), 1),
    rtol=1e-4, atol=1e-5,
), "2-process knn_global mismatch"

# --- multislice: one slice per process, DCN-merged serving -------------
ms = build_index_multislice(reader, n=n, n_slices=2, leaf_size=2)
assert ms.num_slices == 2
assert sum(s is not None for s in ms.slices) == 1, (
    "each process must build exactly its own slice"
)
mr, md2 = knn_multislice(ms, q, k=3, radius=radius)
assert np.allclose(
    np.sort(md2, 1), np.sort(np.asarray(ed2), 1), rtol=1e-4, atol=1e-5
), "2-process knn_multislice mismatch"

sr, sd2, cnt, ov = search_multislice(ms, q, 1.5)
truth = np.asarray(exact_ball(full, q, 1.5))
for qi in range(4):
    got = {int(x) for x in sr[qi].tolist() if x >= 0}
    want = set(np.nonzero(truth[qi])[0].tolist())
    assert got == want, f"2-process search_multislice mismatch q{qi}"

# --- sharded SCAN serving across the process boundary -------------------
# the multi-chip QPS multiplier: per-shard packed kernel inside shard_map,
# [Q, k] all-gather merge — here the all-gather genuinely crosses Gloo
from vector_database_tpu.parallel import (  # noqa: E402
    pack_database_sharded,
    sharded_scan_knn,
)

# block=32 -> 51 rows/shard pad to 2 LOCAL blocks, so probes=1 below is
# genuinely pruned (probes >= nb_loc silently falls back to the full scan)
sdb = pack_database_sharded(full, mesh, block=32, buckets=32)
assert sdb.vb.shape[1] == 2, sdb.vb.shape
srows, sd2k = sharded_scan_knn(sdb, q, k=3, q_tile=8)
assert np.allclose(
    np.sort(np.asarray(sd2k), 1), np.sort(np.asarray(ed2), 1),
    rtol=1e-4, atol=1e-5,
), "2-process sharded_scan_knn mismatch"
# pruned per-shard stream (probes=1 of 2 local blocks): every query's
# top-1 block is forced into its tile list, so self-queries (q = rows
# of `full`) must still find themselves at distance 0
prows, pd2 = sharded_scan_knn(sdb, full[:8], k=1, q_tile=8, probes=1)
assert np.allclose(np.asarray(pd2)[:, 0], 0.0, atol=1e-5), (
    "2-process pruned sharded scan lost self-matches"
)

print(f"PROC {pid} ALL-OK", flush=True)
