"""C++ native metrics must match the Python implementation exactly."""
import numpy as np
import pytest

from repconc_tpu import native
from repconc_tpu.eval.trec import evaluate_run, parse_qrels, parse_run


@pytest.fixture(scope="module")
def native_mod():
    mod = native.load()
    if mod is None:
        pytest.skip("no C++ toolchain available")
    return mod


def make_files(tmp_path, rng, nq=50, ndocs=500, per_q=100):
    qrel_path = tmp_path / "qrels.txt"
    run_path = tmp_path / "run.tsv"
    with open(qrel_path, "w") as f:
        for q in range(nq):
            for d in rng.choice(ndocs, size=rng.integers(1, 6), replace=False):
                f.write(f"q{q} 0 d{d} {rng.integers(1, 4)}\n")
    with open(run_path, "w") as f:
        for q in range(nq):
            docs = rng.choice(ndocs, size=per_q, replace=False)
            scores = np.round(rng.normal(size=per_q), 2)  # force some ties
            order = np.argsort(-scores)
            for r, j in enumerate(order):
                f.write(f"q{q}\tQ0\td{docs[j]}\t{r+1}\t{scores[j]}\tSys\n")
    return str(qrel_path), str(run_path)


def test_parity_with_python(native_mod, tmp_path, rng):
    qrel_path, run_path = make_files(tmp_path, rng)
    ks, mrrs = (1, 3, 5, 10, 100), (10, 100)
    got = native_mod.evaluate_files(qrel_path, run_path, ks, mrrs, 1)
    want = evaluate_run(qrel_path, run_path, ks, mrrs, 1)
    for group in ("ndcg", "map", "recall", "precision", "mrr"):
        for key, v in want[group].items():
            assert abs(got[group][key] - v) < 1e-9, (group, key, got[group][key], v)
    assert got["num_queries"] == len(want["perquery"])


def test_parity_relevance_level(native_mod, tmp_path, rng):
    qrel_path, run_path = make_files(tmp_path, rng, nq=20)
    got = native_mod.evaluate_files(qrel_path, run_path, (5, 10), (10,), 2)
    want = evaluate_run(qrel_path, run_path, (5, 10), (10,), 2)
    for group in ("map", "recall", "precision", "mrr", "ndcg"):
        for key, v in want[group].items():
            assert abs(got[group][key] - v) < 1e-9, (group, key)


def test_wrapper_fallback(tmp_path, rng):
    qrel_path, run_path = make_files(tmp_path, rng, nq=5)
    m = native.evaluate_files(qrel_path, run_path, (10,), (10,))
    assert "MRR@10" in m["mrr"]


def test_no_toolchain_falls_back_to_python(tmp_path, rng, monkeypatch):
    """With no compiler and no cached .so (the .so is NOT checked into git;
    it is built on demand), load() must return None and evaluate_files must
    produce the pure-Python result."""
    monkeypatch.setattr(native, "_module", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_SO_PATH",
                        str(tmp_path / "nonexistent" / "_trec_native.so"))
    monkeypatch.setattr(native, "_build", lambda: False)
    assert native.load() is None
    qrel_path, run_path = make_files(tmp_path, rng, nq=5)
    got = native.evaluate_files(qrel_path, run_path, (10,), (10,))
    want = evaluate_run(qrel_path, run_path, (10,), (10,))
    assert abs(got["mrr"]["MRR@10"] - want["mrr"]["MRR@10"]) < 1e-9


def test_malformed_lines_skipped_not_truncating(native_mod, tmp_path, rng):
    """A malformed line must be SKIPPED — it must not stop the parse and
    silently drop the rest of the file (the failure mode of a bare fscanf
    loop), and a repeated (qid, docid) keeps its LAST score like python's
    dict-based parse_run."""
    qrel_path = tmp_path / "qrels.txt"
    run_path = tmp_path / "run.tsv"
    with open(qrel_path, "w") as f:
        f.write("q1 0 d1 1\n")
        f.write("malformed header line\n")      # no rel integer
        f.write("\n")
        f.write("q2 0 d2 1\n")                  # must still be parsed
    with open(run_path, "w") as f:
        f.write("q1\tQ0\td1\t1\t0.5\tSys\n")
        f.write("q1\tQ0\td1\t2\t9.9\tSys\n")    # duplicate: last wins
        f.write("q1\tQ0\td9\t3\t1.0\tSys\n")
        f.write("bogus line without numeric fields\n")
        f.write("q2\tQ0\td2\t1\t1.0\tSys\n")    # after the bogus line
    got = native_mod.evaluate_files(str(qrel_path), str(run_path),
                                    (10,), (10,), 1)
    # q2 parsed despite the earlier malformed lines -> both queries count
    assert got["num_queries"] == 2
    # duplicate d1 kept its LAST score 9.9 > d9's 1.0 -> rank 1 for q1;
    # with truncation-on-malformed q2 would be lost and MRR@10 would be 1.0
    # from q1 alone — the average over both queries pins the dedupe too
    assert abs(got["mrr"]["MRR@10"] - 1.0) < 1e-9
    want = evaluate_run(
        {"q1": {"d1": 1}, "q2": {"d2": 1}},
        {"q1": {"d1": 9.9, "d9": 1.0}, "q2": {"d2": 1.0}}, (10,), (10,))
    assert abs(got["mrr"]["MRR@10"] - want["mrr"]["MRR@10"]) < 1e-9


def test_evaluate_run_auto_dispatch(native_mod, tmp_path, rng, monkeypatch):
    """evaluate_run with file paths above the size threshold must route to
    the native backend (empty perquery marks the native result)."""
    from repconc_tpu.eval import trec

    qrel_path, run_path = make_files(tmp_path, rng, nq=10)
    monkeypatch.setattr(trec, "_NATIVE_MIN_RUN_BYTES", 0)
    got = trec.evaluate_run(qrel_path, run_path)
    assert got["perquery"] == {}  # native path taken
    want = evaluate_run(parse_qrels(qrel_path), parse_run(run_path))
    for group in ("ndcg", "map", "recall", "precision", "mrr"):
        for key, v in want[group].items():
            assert abs(got[group][key] - v) < 1e-9, (group, key)
