"""Streaming scan k-NN: must match the exact oracle (f32 path exactly,
bf16 path on clearly-separated data)."""

import numpy as np

from vector_database_tpu import exact_knn, scan_knn
from vector_database_tpu.utils import datasets


def test_precise_matches_exact():
    vecs = datasets.random_uniform(5000, 16, seed=100)
    queries = datasets.random_uniform(8, 16, seed=101)
    rows, d2 = scan_knn(vecs, queries, k=10, block=1024, precise=True)
    eidx, ed2 = exact_knn(vecs, queries, k=10)
    np.testing.assert_allclose(
        np.sort(np.asarray(d2), axis=1),
        np.sort(np.asarray(ed2), axis=1),
        rtol=1e-4, atol=1e-5,
    )
    # identical neighbor sets
    for qi in range(8):
        assert set(np.asarray(rows)[qi].tolist()) == set(
            np.asarray(eidx)[qi].tolist()
        )


def test_unaligned_n_padding():
    vecs = datasets.random_uniform(1037, 8, seed=102)  # not block-aligned
    queries = vecs[[3, 999]]
    rows, d2 = scan_knn(vecs, queries, k=1, block=256, precise=True)
    rows = np.asarray(rows)
    assert rows[0, 0] == 3 and rows[1, 0] == 999
    assert np.allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-5)
    assert (rows < 1037).all()  # padded rows never surface


def test_k_larger_than_block():
    vecs = datasets.random_uniform(300, 4, seed=103)
    queries = datasets.random_uniform(2, 4, seed=104)
    rows, d2 = scan_knn(vecs, queries, k=50, block=64, precise=True)
    eidx, _ = exact_knn(vecs, queries, k=50)
    for qi in range(2):
        assert set(np.asarray(rows)[qi].tolist()) == set(
            np.asarray(eidx)[qi].tolist()
        )


def test_precise_k_exceeds_block():
    """precise=True with k wider than the DMA block: the per-block
    selection caps at the block width and the running merge accumulates
    the rest (this used to crash in top_k)."""
    vecs = datasets.random_uniform(200, 4, seed=105)
    queries = datasets.random_uniform(2, 4, seed=106)
    rows, d2 = scan_knn(vecs, queries, k=100, block=64, precise=True)
    eidx, _ = exact_knn(vecs, queries, k=100)
    for qi in range(2):
        assert set(np.asarray(rows)[qi].tolist()) == set(
            np.asarray(eidx)[qi].tolist()
        )


def test_similarity_sorted_layout():
    # regression: a similarity-sorted database (e.g. a BSPIndex's
    # leaf-major layout) puts all of a query's neighbors in one contiguous
    # region; contiguous buckets would collapse to one candidate there
    rng = np.random.default_rng(120)
    centers = (rng.random((16, 16)) * 2 - 1).astype(np.float32)
    # noise well above bf16 ranking error so only bucket geometry matters
    vecs = np.concatenate(  # cluster-contiguous = similarity-sorted
        [c + rng.normal(0, 0.1, (256, 16)).astype(np.float32)
         for c in centers]
    )
    queries = centers[:4].astype(np.float32)
    rows, _ = scan_knn(
        vecs, queries, k=10, block=1024, buckets=128, oversample=16
    )
    eidx, _ = exact_knn(vecs, queries, k=10)
    for qi in range(4):
        got = set(np.asarray(rows)[qi].tolist())
        want = set(np.asarray(eidx)[qi].tolist())
        # residual misses = same-bucket partner collisions only
        assert len(got & want) >= 8, f"query {qi}: {len(got & want)}/10"


def test_bf16_recall_on_separated_data():
    rng = np.random.default_rng(105)
    centers = (rng.random((20, 32)) * 2 - 1).astype(np.float32)
    vecs = np.concatenate(
        [c + rng.normal(0, 0.01, (50, 32)).astype(np.float32)
         for c in centers]
    )
    queries = centers[:4].astype(np.float32)
    # all 50 cluster-mates are within bf16 rounding of each other, so the
    # shortlist must cover the whole confusable set: oversample 8 -> 80
    rows, d2 = scan_knn(vecs, queries, k=10, block=256, oversample=8)
    eidx, ed2 = exact_knn(vecs, queries, k=10)
    for qi in range(4):
        got = set(np.asarray(rows)[qi].tolist())
        want = set(np.asarray(eidx)[qi].tolist())
        assert got == want  # f32 rerank over the full confusable set
    # reranked distances are f32-exact for the hits
    np.testing.assert_allclose(
        np.asarray(d2)[0], np.asarray(ed2)[0], rtol=1e-3, atol=1e-5
    )


def test_exact_knn_streamed_blocks():
    """The oracle itself must scale: above `block` rows exact_knn streams
    [Q, block] tiles with a running top-k merge — identical neighbor sets
    and distances (to fusion-order ulps) as the single-pass form, and
    k > n pads the contract the same way on both paths."""
    from vector_database_tpu.ops.exact import exact_knn

    rng = np.random.RandomState(5)
    v = rng.rand(5000, 8).astype(np.float32)
    q = rng.rand(16, 8).astype(np.float32)
    a_i, a_d = exact_knn(v, q, k=7)
    b_i, b_d = exact_knn(v, q, k=7, block=512)
    np.testing.assert_allclose(
        np.sort(np.asarray(a_d), 1), np.sort(np.asarray(b_d), 1),
        rtol=1e-5, atol=1e-6,
    )
    for i in range(16):
        assert set(np.asarray(a_i)[i].tolist()) == set(
            np.asarray(b_i)[i].tolist()
        )
    c_i, c_d = exact_knn(v[:5], q, k=7, block=2)
    assert (np.asarray(c_i)[:, 5:] == -1).all()
    assert np.isinf(np.asarray(c_d)[:, 5:]).all()
    d_i, _ = exact_knn(v[:5], q, k=7)
    assert set(np.asarray(c_i)[0, :5].tolist()) == set(
        np.asarray(d_i)[0, :5].tolist()
    )


def test_imprecise_small_n_still_reranks_f32():
    """n <= k makes the shortlist the whole result set; its scores must
    still be f32-reranked (regression: raw bf16 scores, ~1e-2 relative,
    leaked out and misordered downstream exact merges)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(77)
    vecs = jnp.asarray(rng.rand(6, 16).astype(np.float32) * 2 - 1)
    qs = jnp.asarray(rng.rand(3, 16).astype(np.float32) * 2 - 1)
    rows, d2 = scan_knn(vecs, qs, k=10, precise=False)
    rows, d2 = np.asarray(rows), np.asarray(d2)
    v, q = np.asarray(vecs), np.asarray(qs)
    for i in range(3):
        got = rows[i][rows[i] >= 0]
        exact = ((v[got] - q[i]) ** 2).sum(1)
        np.testing.assert_allclose(
            d2[i][rows[i] >= 0], exact, rtol=1e-6, atol=1e-7
        )


def test_exact_knn_default_block_scales_with_batch():
    """block=None sizes the streamed [Q, block] tile to the batch: a
    10M-row truth run at q=4096 with the old fixed 1M-row block tried to
    materialize a 15 GB f32 tile and OOM'd a 16 GB chip (measured).
    The auto-sized path must agree with an explicit tiny block."""
    from vector_database_tpu.ops.exact import exact_knn

    rng = np.random.RandomState(11)
    v = rng.rand(3000, 8).astype(np.float32)
    for q_rows in (1, 9, 130):
        q = rng.rand(q_rows, 8).astype(np.float32)
        a_i, a_d = exact_knn(v, q, k=5)  # auto block (>= n here: one-shot)
        b_i, b_d = exact_knn(v, q, k=5, block=257)  # forced streaming
        np.testing.assert_allclose(
            np.sort(np.asarray(a_d), 1), np.sort(np.asarray(b_d), 1),
            rtol=1e-5, atol=1e-6,
        )
        for i in range(q_rows):
            assert set(np.asarray(a_i)[i].tolist()) == set(
                np.asarray(b_i)[i].tolist()
            )
    # the auto-sizing formula itself: tile stays ~2 GiB
    for q_rows, want_max in ((1, 1_000_000), (4096, 131_072), (10**6, 65_536)):
        block = max(65_536, min(1_000_000, (1 << 29) // q_rows))
        assert block <= max(want_max, 65_536)
        assert 4 * q_rows * block <= (1 << 31) + 4 * q_rows * 65_536
