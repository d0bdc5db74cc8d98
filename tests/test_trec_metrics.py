"""trec_eval-parity tests with hand-computed expected values."""
import math

import pytest

from repconc_tpu.eval.trec import evaluate_run, truncate_run, parse_qrels, parse_run


def test_simple_perfect_ranking():
    qrels = {"q1": {"d1": 1}}
    run = {"q1": {"d1": 10.0, "d2": 5.0}}
    m = evaluate_run(qrels, run, k_values=(1, 10), mrr_k_values=(10,))
    assert m["ndcg"]["NDCG@1"] == 1.0
    assert m["ndcg"]["NDCG@10"] == 1.0
    assert m["map"]["MAP@10"] == 1.0
    assert m["recall"]["Recall@1"] == 1.0
    assert m["precision"]["P@1"] == 1.0
    assert m["mrr"]["MRR@10"] == 1.0


def test_rank_two_hit():
    qrels = {"q1": {"d2": 1}}
    run = {"q1": {"d1": 10.0, "d2": 5.0, "d3": 1.0}}
    m = evaluate_run(qrels, run, k_values=(1, 3), mrr_k_values=(3,))
    # relevant at rank 2: ndcg@3 = (1/log2(3)) / (1/log2(2)) = 1/log2(3)
    assert m["ndcg"]["NDCG@3"] == round(1 / math.log2(3), 5)
    assert m["ndcg"]["NDCG@1"] == 0.0
    assert m["map"]["MAP@3"] == 0.5
    assert m["mrr"]["MRR@3"] == 0.5
    assert m["precision"]["P@1"] == 0.0
    assert m["recall"]["Recall@3"] == 1.0


def test_tie_break_docid_descending():
    # trec_eval breaks score ties by docid DESC: d9 ranks above d1
    qrels = {"q1": {"d1": 1}}
    run = {"q1": {"d1": 5.0, "d9": 5.0}}
    m = evaluate_run(qrels, run, k_values=(1,), mrr_k_values=(10,))
    assert m["precision"]["P@1"] == 0.0  # d9 took rank 1
    assert m["mrr"]["MRR@10"] == 0.5


def test_graded_ndcg():
    # graded qrels: gains are raw rel values
    qrels = {"q1": {"d1": 3, "d2": 1}}
    run = {"q1": {"d2": 10.0, "d1": 5.0}}  # retrieve low-grade first
    m = evaluate_run(qrels, run, k_values=(2,), mrr_k_values=(10,))
    dcg = 1 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert m["ndcg"]["NDCG@2"] == round(dcg / idcg, 5)


def test_map_divides_by_total_relevant():
    # 3 relevant total, only 1 retrieved in top-2: map_cut_2 = (1/1) / 3
    qrels = {"q1": {"d1": 1, "d5": 1, "d6": 1}}
    run = {"q1": {"d1": 10.0, "d2": 9.0}}
    m = evaluate_run(qrels, run, k_values=(2,), mrr_k_values=(10,))
    assert m["map"]["MAP@2"] == round(1 / 3, 5)
    assert m["recall"]["Recall@2"] == round(1 / 3, 5)


def test_averaging_over_evaluated_queries_only():
    qrels = {"q1": {"d1": 1}}  # q2 has no qrels -> excluded
    run = {"q1": {"d1": 1.0}, "q2": {"d1": 1.0}}
    m = evaluate_run(qrels, run, k_values=(1,), mrr_k_values=(10,))
    assert m["precision"]["P@1"] == 1.0
    assert set(m["perquery"].keys()) == {"q1"}


def test_mrr_truncation():
    # relevant doc at rank 11: MRR@10 = 0, MRR@100 = 1/11
    run_docs = {f"d{i:02d}": float(100 - i) for i in range(1, 21)}
    qrels = {"q1": {"d11": 1}}
    m = evaluate_run(qrels, {"q1": run_docs}, k_values=(10,), mrr_k_values=(10, 100))
    assert m["mrr"]["MRR@10"] == 0.0
    assert m["mrr"]["MRR@100"] == round(1 / 11, 5)


def test_relevance_level():
    qrels = {"q1": {"d1": 1, "d2": 2}}
    run = {"q1": {"d1": 10.0, "d2": 5.0}}
    m = evaluate_run(qrels, run, k_values=(1,), mrr_k_values=(10,), relevance_level=2)
    # with level 2, d1 (rel=1) is NOT relevant for binary metrics
    assert m["precision"]["P@1"] == 0.0
    assert m["mrr"]["MRR@10"] == 0.5


def test_truncate_run():
    run = {"q1": {"d1": 1.0, "d2": 3.0, "d3": 2.0}}
    t = truncate_run(run, 2)
    assert set(t["q1"].keys()) == {"d2", "d3"}


def test_file_roundtrip(tmp_path):
    qrel_path = tmp_path / "qrels.txt"
    qrel_path.write_text("q1 0 d1 1\nq1 0 d2 0\nq2 0 d3 2\n")
    run_path = tmp_path / "run.tsv"
    run_path.write_text("q1\tQ0\td1\t1\t9.5\tSys\nq2\tQ0\td3\t1\t8.0\tSys\n")
    qrels = parse_qrels(str(qrel_path))
    assert qrels == {"q1": {"d1": 1, "d2": 0}, "q2": {"d3": 2}}
    m = evaluate_run(str(qrel_path), str(run_path), k_values=(1,), mrr_k_values=(10,))
    assert m["precision"]["P@1"] == 1.0


def test_ranking_shorter_than_cutoff():
    qrels = {"q1": {"d1": 1, "d2": 1}}
    run = {"q1": {"d1": 3.0}}  # only one doc retrieved
    m = evaluate_run(qrels, run, k_values=(1, 100), mrr_k_values=(10,))
    assert m["recall"]["Recall@100"] == 0.5
    assert m["precision"]["P@100"] == round(1 / 100, 5)
