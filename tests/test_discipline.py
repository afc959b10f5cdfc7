"""jit-purity, donation, and numeric-discipline checks (SURVEY.md §5).

The reference's "race detection" story is documented single-threadedness
plus ``checked`` arithmetic (MemoryRangeStore.cs:5, IndexBuilder.cs:99-104).
The TPU-native equivalents asserted here:

- **no tracer leaks**: the builders and search paths are pure under jit
  (``jax.checking_leaks``);
- **no recompile churn**: repeated same-shape calls hit the jit cache
  exactly once — compile-per-call is this environment's analogue of a
  pathological lock (20s-5min remote compiles);
- **donation discipline**: ``donate=True`` actually releases the input
  buffer (the builder's in-place permutation claim is real, not aliased);
- **no NaNs**: the whole build+search pipeline is NaN-free under
  ``jax.debug_nans`` (inf pads are fine and excluded by the flag);
- **no out-of-bounds gathers**: the clip-then-mask gather pattern used by
  the rerank paths passes ``checkify`` index checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from vector_database_tpu import build_index_fused, exact_knn
from vector_database_tpu.ops.scan_knn import scan_knn
from vector_database_tpu.search import knn, search
from vector_database_tpu.utils import datasets


@pytest.fixture(scope="module")
def small():
    vecs = datasets.random_uniform(512, 8, seed=41)
    queries = datasets.random_uniform(16, 8, seed=42)
    return np.asarray(vecs), np.asarray(queries)


def test_no_tracer_leaks(small):
    vecs, queries = small
    with jax.checking_leaks():
        index = build_index_fused(vecs, leaf_size=4)
        res = search(index, queries, 0.5)
        res.rows.block_until_ready()


def test_no_recompile_churn(small):
    """Same-shape calls must not retrace: one cache entry per shape."""
    vecs, queries = small

    @jax.jit
    def serve(v, q):
        return scan_knn(v, q, k=5)

    serve(jnp.asarray(vecs), jnp.asarray(queries))
    serve(jnp.asarray(vecs * 0.5), jnp.asarray(queries + 1.0))
    assert serve._cache_size() == 1


def test_donation_releases_input(small):
    vecs, _ = small
    buf = jnp.asarray(vecs)
    build_index_fused(buf, leaf_size=4, donate=True)
    assert buf.is_deleted()


def test_donated_build_matches_undonated(small):
    vecs, queries = small
    a = build_index_fused(vecs, leaf_size=4)
    b = build_index_fused(jnp.asarray(vecs), leaf_size=4, donate=True)
    np.testing.assert_array_equal(np.asarray(a.dim), np.asarray(b.dim))
    np.testing.assert_array_equal(
        np.asarray(a.orig_row), np.asarray(b.orig_row)
    )


def test_pipeline_nan_free(small):
    vecs, queries = small
    with jax.debug_nans(True):
        index = build_index_fused(vecs, leaf_size=4)
        rows, d2 = knn(index, queries, k=5, radius=1.0)
        jnp.asarray(d2).block_until_ready()
        erows, ed2 = exact_knn(vecs, queries, k=5)
        ed2.block_until_ready()


def test_rerank_gathers_in_bounds(small):
    """checkify index checks over the scan+rerank path: the clip-then-mask
    gather contract holds (no reliance on XLA's silent clamping)."""
    vecs, queries = small

    def f(v, q):
        return scan_knn(v, q, k=5)

    checked = checkify.checkify(
        jax.jit(f), errors=checkify.index_checks
    )
    err, (rows, d2) = checked(jnp.asarray(vecs), jnp.asarray(queries))
    err.throw()  # no-op unless a gather went out of bounds
    eidx, _ = exact_knn(vecs, queries, k=5)
    assert set(np.asarray(rows)[0].tolist()) == set(
        np.asarray(eidx)[0].tolist()
    )
