"""SpLiCE / ADMM / greedy decomposition tests
(reference behavior: additional_approaches/src/my_splice/splice_module.py,
admm.py, greedy_decomposer.py)."""

import numpy as np
import pytest

from srsem.decompose.admm import admm_lasso
from srsem.decompose.greedy import GreedyDecomposer
from srsem.decompose.splice import SpliceDecomposer


@pytest.fixture(scope="module")
def dictionary(rng=None):
    r = np.random.default_rng(42)
    concepts = r.standard_normal((50, 16)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)
    return concepts


def test_admm_recovers_sparse_nonnegative_combo(dictionary):
    r = np.random.default_rng(0)
    true_w = np.zeros((1, 50), np.float32)
    true_w[0, [3, 17, 30]] = [1.0, 0.5, 2.0]
    v = true_w @ dictionary
    w = np.asarray(admm_lasso(dictionary, v, l1_penalty=0.02))
    assert w.shape == (1, 50)
    assert (w >= -1e-6).all()  # nonnegativity
    top = set(np.argsort(-w[0])[:3])
    assert top == {3, 17, 30}


def test_admm_matches_sklearn_positive_lasso(dictionary):
    """Both solvers minimize the same objective → near-identical solutions
    (the reference offers both paths, splice_module.py:224-240)."""
    sklearn = pytest.importorskip("sklearn.linear_model")
    r = np.random.default_rng(1)
    v = r.standard_normal((1, 16)).astype(np.float32)
    l1 = 0.1
    ours = np.asarray(admm_lasso(dictionary, v, l1_penalty=l1,
                                 tol=1e-8, max_iter=20000))[0]
    clf = sklearn.Lasso(alpha=l1 / (2 * 16), fit_intercept=False,
                        positive=True, max_iter=100000, tol=1e-10)
    clf.fit(dictionary.T, v[0])
    np.testing.assert_allclose(ours, clf.coef_, atol=5e-3)


def test_splice_rank_search_hits_exact_rank(dictionary):
    r = np.random.default_rng(2)
    mean = np.zeros(16, np.float32)
    sp = SpliceDecomposer(dictionary, mean,
                          vocab=[f"w{i}" for i in range(50)])
    emb = r.standard_normal((1, 16)).astype(np.float32)
    rank = 5
    w = sp.decompose(emb, solver="admm", rank=rank)
    assert w is not None
    assert int(np.count_nonzero(w[0])) == rank
    # Hint cache now contains the found l1 for this rank.
    assert rank in sp.l1p_hint["admm"]
    l0, words, scores = sp.weights2words(w)
    assert l0[0] == rank and len(words[0]) == rank
    # Scores sorted descending.
    assert all(np.diff(scores[0]) <= 1e-9)


def test_splice_recompose_is_unit_norm(dictionary):
    sp = SpliceDecomposer(dictionary, np.zeros(16, np.float32))
    w = np.zeros((2, 50), np.float32)
    w[0, 4] = 1.0
    w[1, [1, 2]] = 0.7
    rec = sp.recompose(w)
    np.testing.assert_allclose(np.linalg.norm(rec, axis=1), 1.0, atol=1e-5)


def test_greedy_decomposer_selects_best_concept_first(dictionary):
    target = dictionary[7] * 2.0
    g = GreedyDecomposer(dictionary, vocab=[f"w{i}" for i in range(50)],
                         rank=3, mode="debug")
    comps, originals, texts = g(target)
    assert texts[0] == "w7"
    assert comps.shape == (3, 16)
    # After deflation the residual is orthogonal to chosen directions:
    # reconstructions differ from naive averaging but stay finite.
    assert np.isfinite(np.asarray(comps)).all()


@pytest.mark.parametrize("mode", ["w_filt_rec", "filt_rec", "w_rec", "rec"])
def test_greedy_modes_return_vectors(dictionary, mode):
    g = GreedyDecomposer(dictionary, rank=4, mode=mode)
    out = g(dictionary[0])
    assert out.shape == (16,)
    assert np.isfinite(np.asarray(out)).all()


def test_force_compute_basis_damped_search(dictionary):
    """Legacy rank search with sigmoid-damped l1 stepping
    (reference: splice_wrapper_old.py:16-73)."""
    sp = SpliceDecomposer(dictionary, np.zeros(16, np.float32),
                          vocab=[f"w{i}" for i in range(50)])
    emb = np.random.default_rng(5).standard_normal((1, 16)).astype(np.float32)
    res = sp.force_compute_basis(emb, rank=4)
    assert res is not None
    assert int(np.count_nonzero(res["weights"])) == 4
    assert len(res["words"]) == 4


def test_project_to_basis_restricts_support(dictionary):
    """Projection reuses only the source decomposition's support
    (reference: splice_wrapper_old.py:120-167)."""
    sp = SpliceDecomposer(dictionary, np.zeros(16, np.float32))
    w = np.zeros((1, 50), np.float32)
    w[0, [2, 7, 11]] = [1.0, 0.4, 0.2]
    target = np.random.default_rng(6).standard_normal((1, 16)).astype(np.float32)
    rec = sp.project_to_basis(w, target)
    assert rec.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(rec, axis=1), 1.0, atol=1e-4)


def test_find_all_basis_rank_range_shares_hints(dictionary):
    sp = SpliceDecomposer(dictionary, np.zeros(16, np.float32))
    emb = np.random.default_rng(7).standard_normal((1, 16)).astype(np.float32)
    out = sp.find_all_basis_rank_range(emb, 3, 5)
    assert set(out) <= {3, 4, 5}
    for rank, w in out.items():
        assert int(np.count_nonzero(w[0])) == rank
    # hint cache accumulated entries across the sweep
    assert len(sp.l1p_hint["admm"]) >= len(out)


def test_splice_hint_file_roundtrip(tmp_path, dictionary):
    """save_l1p_hint → with_hints_file round-trips (nested {solver: {rank:
    l1}} form), and the flat {rank: l1} reference hint format still loads
    (review r4)."""
    mean = np.zeros(16, np.float32)
    sp = SpliceDecomposer(dictionary, mean)
    sp.l1p_hint["admm"][5] = 0.25
    sp.l1p_hint["skl"][7] = 0.125
    path = tmp_path / "hints.json"
    sp.save_l1p_hint(str(path))

    sp2 = SpliceDecomposer.with_hints_file(dictionary, mean, str(path))
    assert sp2.l1p_hint["admm"][5] == 0.25
    assert sp2.l1p_hint["skl"][7] == 0.125

    import json

    flat = tmp_path / "flat.json"
    flat.write_text(json.dumps({"5": 0.5}))
    sp3 = SpliceDecomposer.with_hints_file(dictionary, mean, str(flat))
    assert sp3.l1p_hint["admm"][5] == 0.5


def test_greedy_weighted_modes_finite_on_zero_sum(dictionary):
    """w_rec/w_filt_rec guard the exact-zero cosine-sum singularity —
    output stays finite (review r4)."""
    target = dictionary[0] - dictionary[1]  # mixed-sign cosines likely
    for mode in ("w_rec", "w_filt_rec"):
        dec = GreedyDecomposer(dictionary, rank=4, mode=mode)
        out = np.asarray(dec(target))
        assert np.isfinite(out).all()
