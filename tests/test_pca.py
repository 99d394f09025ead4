"""PCA power-method: agreement with numpy's exact eigendecomposition,
variance accounting, and the map-side scoring plan."""

import numpy as np
import pytest

from vectordb_from_scratch_spark.operators import pca


def _numpy_cov(spark, sf_dir):
    from vectordb_from_scratch_spark.session import load_table

    X = np.asarray(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ]
    )
    Xc = X - X.mean(axis=0)
    return X, (Xc.T @ Xc) / len(X)


def test_power_iterates_track_numpy_eigh(spark, sf_small):
    mu, v1, eig1, v2, eig2, trace = pca.fit_pca2(spark, sf_small)
    _, C = _numpy_cov(spark, sf_small)
    vals, vecs = np.linalg.eigh(C)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-9)
    assert np.linalg.norm(v2) == pytest.approx(1.0, abs=1e-9)
    # each iterate's Rayleigh quotient is inside the true spectrum and
    # nearly exhausts its target eigenvalue; the pair is ordered
    assert vals[-2] - 1e-9 <= eig1 <= vals[-1] + 1e-9
    assert eig1 >= 0.9 * vals[-1]
    assert eig2 <= eig1 + 1e-12
    assert eig2 >= 0.8 * vals[-2] - 1e-9
    # dominant directions match numpy's (sign-free), components ~orthogonal
    assert abs(float(v1 @ vecs[:, -1])) > 0.95
    assert abs(float(v1 @ v2)) < 0.05
    assert trace == pytest.approx(float(np.trace(C)), rel=1e-9)


def test_scores_variance_equals_rayleigh(spark, sf_small):
    """var(pc1 scores) == v₁ᵀCv₁ by construction — the accounting
    identity that pins the projection against the trained component."""
    mu, v1, eig1, v2, eig2, trace = pca.fit_pca2(spark, sf_small)
    rows = pca.embedding_pca_scores(spark, sf_small).collect()
    s1 = np.asarray([r["pc1"] for r in rows])
    s2 = np.asarray([r["pc2"] for r in rows])
    assert s1.var() == pytest.approx(eig1, rel=1e-4)
    assert abs(s1.mean()) < 1e-5 and abs(s2.mean()) < 1e-5
    # PC2 carries less (deflated) variance; ratios are sane
    assert s2.var() <= s1.var() + 1e-9
    assert 0.0 < eig2 / trace <= eig1 / trace <= 1.0


def test_scores_plan_is_map_side(spark, sf_small):
    """Scoring must be one scan + projection — no Exchange, no Python."""
    from vectordb_from_scratch_spark import plans

    df = pca.embedding_pca_scores(spark, sf_small)
    plan = plans.physical_plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_jl_sign_matrix_balanced_and_deterministic():
    s = pca.jl_signs()
    assert len(s) == pca.JL_DIMS and all(len(r) == pca.DIMS for r in s)
    flat = [x for r in s for x in r]
    assert set(flat) == {1, -1}
    # md5 parity is ~fair: neither sign dominates the 1,024 draws
    pos = sum(1 for x in flat if x == 1)
    assert 400 < pos < 624
    assert pca.jl_signs() == s  # pure function of constants


def test_jl_distortion_concentrates_near_one(spark, sf_small):
    """The JL guarantee, empirically: squared-distance ratios center on 1
    with spread consistent with d'=16 (sd ~ sqrt(2/16) ≈ 0.35)."""
    rows = pca.eval_jl_distortion(spark, sf_small).collect()
    assert len(rows) == 40 * 39 // 2
    ratios = np.asarray([r["distortion"] for r in rows])
    assert 0.9 < np.median(ratios) < 1.1
    assert (ratios > 0.2).all() and (ratios < 3.0).all()


def test_jl_project_plan_is_map_side(spark, sf_small):
    from vectordb_from_scratch_spark import plans

    df = pca.embedding_jl_project(spark, sf_small)
    plan = plans.physical_plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_streaming_moments_match_batch(spark, sf_small, tmp_path):
    """The streaming (n, Σx, Σxxᵀ) accumulator after draining the stream
    equals the batch moment pass — addition-mergeable state, so
    incremental PCA never revisits history. DOUBLE sums compare at 1e-9
    relative (float associativity), not bit-identity like the integer
    sketch twins."""
    from vectordb_from_scratch_spark import sources, streaming
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_small, "embeddings").select("embedding")
    src = str(tmp_path / "pca_stream")
    emb.repartition(4).write.parquet(src)
    stream = sources.read_stream(
        spark, src, schema=spark.read.parquet(src).schema
    )
    out = streaming.pca_moments_stream(stream)
    streaming.run_stream_to_memory(out, "t_pca_stream", output_mode="complete")

    got = {
        (r["kind"], r["idx"]): r["total"]
        for r in spark.table("t_pca_stream").collect()
    }
    want = {
        (r["kind"], r["idx"]): r["total"]
        for r in streaming.pca_moments_stream(emb).collect()
    }
    assert set(got) == set(want)
    assert len(want) == 1 + pca.DIMS + pca.DIMS * pca.DIMS  # bounded state
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12), k


def test_recon_error_accounting(spark, sf_small):
    """Rank-2 residual invariants: err² ≥ 0, retained ∈ [0, 1], and the
    corpus-average retained energy matches (λ₁+λ₂)/trace to first order
    (the components are near-orthonormal after 40 steps)."""
    mu, v1, eig1, v2, eig2, trace = pca.fit_pca2(spark, sf_small)
    rows = pca.eval_pca_recon_error(spark, sf_small).collect()
    assert rows
    errs = np.asarray([r["recon_err2"] for r in rows])
    ret = np.asarray([r["retained_ratio"] for r in rows])
    assert (errs >= -1e-9).all()
    assert (ret <= 1.0 + 1e-9).all()
    # energy accounting over the corpus: mean err² = trace - λ1 - λ2
    want_mean_err = trace - eig1 - eig2
    assert errs.mean() == pytest.approx(want_mean_err, rel=0.02)
