// Native TREC evaluation: file-level qrels/run parsing + metric computation.
//
// C++ counterpart of repconc_tpu/eval/trec.py with identical semantics
// (score DESC, docid DESC tie-break; averages over run-and-qrels queries;
// ndcg graded gains; map divided by total relevant; MRR via top-k
// truncation). The reference delegates this to pytrec_eval's C extension
// (reference: src/repconc/utils/eval_utils.py:144-201); this module plays
// the same role for multi-million-line run files where Python parsing
// dominates. Exact parity with the Python implementation is enforced by
// tests/test_native_metrics.py.
//
// Exposed API (CPython C API, no pybind11):
//   _trec_native.evaluate_files(qrel_path, run_path, k_values, mrr_k_values,
//                               relevance_level) -> dict
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

using QrelMap = std::unordered_map<std::string,
                                   std::unordered_map<std::string, int>>;
struct RunDoc {
  std::string docid;
  double score;
};
using RunMap = std::unordered_map<std::string, std::vector<RunDoc>>;

// Line-based parsing: a malformed line is SKIPPED, never allowed to
// truncate the rest of the file (a bare fscanf loop stops at the first
// pattern mismatch and would silently evaluate half a run).
bool read_qrels(const char* path, QrelMap* qrels) {
  FILE* f = fopen(path, "r");
  if (!f) return false;
  char line[4096], qid[1024], it[1024], docid[1024];
  long rel;
  while (fgets(line, sizeof(line), f)) {
    if (sscanf(line, "%1023s %1023s %1023s %ld", qid, it, docid, &rel) == 4) {
      (*qrels)[qid][docid] = static_cast<int>(rel);
    }
  }
  fclose(f);
  return true;
}

bool read_run(const char* path, RunMap* run) {
  FILE* f = fopen(path, "r");
  if (!f) return false;
  // python parse_run builds a dict per query (a repeated docid keeps its
  // LAST score); mirror that here, then flatten to the ranked vectors
  std::unordered_map<std::string, std::unordered_map<std::string, double>>
      dedup;
  char line[8192], qid[1024], q0[1024], docid[1024];
  long rank;
  double score;
  while (fgets(line, sizeof(line), f)) {
    if (sscanf(line, "%1023s %1023s %1023s %ld %lf", qid, q0, docid, &rank,
               &score) == 5) {
      dedup[qid][docid] = score;
    }
  }
  fclose(f);
  for (auto& kv : dedup) {
    auto& docs = (*run)[kv.first];
    docs.reserve(kv.second.size());
    for (auto& ds : kv.second) docs.push_back({ds.first, ds.second});
  }
  return true;
}

// trec_eval ranking: score DESC, docid string DESC
void rank_docs(std::vector<RunDoc>* docs) {
  std::stable_sort(docs->begin(), docs->end(),
                   [](const RunDoc& a, const RunDoc& b) {
                     if (a.score != b.score) return a.score > b.score;
                     return a.docid > b.docid;
                   });
}

struct QueryMetrics {
  std::vector<double> ndcg, map, recall, precision;  // per k cut
  std::vector<double> mrr;                           // per mrr cut
};

QueryMetrics evaluate_query(const std::vector<RunDoc>& ranked,
                            const std::unordered_map<std::string, int>& rels,
                            const std::vector<long>& ks,
                            const std::vector<long>& mrr_ks, int rel_level) {
  long num_rel = 0;
  std::vector<int> gains;
  gains.reserve(rels.size());
  for (const auto& kv : rels) {
    if (kv.second >= rel_level) num_rel++;
    if (kv.second > 0) gains.push_back(kv.second);
  }
  std::sort(gains.begin(), gains.end(), std::greater<int>());

  long max_k = 0;
  for (long k : ks) max_k = std::max(max_k, k);

  // prefix quantities at every rank
  double dcg = 0.0, ap_sum = 0.0;
  long hits = 0;
  QueryMetrics out;
  size_t ki = 0;
  std::vector<long> sorted_ks(ks);
  std::sort(sorted_ks.begin(), sorted_ks.end());
  std::unordered_map<long, std::array<double, 4>> at_cut;

  auto record = [&](long k) {
    double idcg = 0.0;
    for (size_t i = 0; i < gains.size() && static_cast<long>(i) < k; ++i) {
      idcg += gains[i] / std::log2(static_cast<double>(i) + 2.0);
    }
    at_cut[k] = {idcg > 0 ? dcg / idcg : 0.0,
                 num_rel > 0 ? ap_sum / num_rel : 0.0,
                 num_rel > 0 ? static_cast<double>(hits) / num_rel : 0.0,
                 static_cast<double>(hits) / k};
  };

  long n = static_cast<long>(ranked.size());
  for (long i = 0; i < std::min(n, max_k); ++i) {
    long rank = i + 1;
    auto it = rels.find(ranked[i].docid);
    int rel = it == rels.end() ? 0 : it->second;
    if (rel > 0) dcg += rel / std::log2(static_cast<double>(rank) + 1.0);
    if (rel >= rel_level) {
      hits++;
      ap_sum += static_cast<double>(hits) / rank;
    }
    while (ki < sorted_ks.size() && sorted_ks[ki] == rank) {
      record(sorted_ks[ki]);
      ki++;
    }
  }
  while (ki < sorted_ks.size()) {
    record(sorted_ks[ki]);
    ki++;
  }
  for (long k : ks) {
    out.ndcg.push_back(at_cut[k][0]);
    out.map.push_back(at_cut[k][1]);
    out.recall.push_back(at_cut[k][2]);
    out.precision.push_back(at_cut[k][3]);
  }
  for (long cut : mrr_ks) {
    double rr = 0.0;
    for (long i = 0; i < std::min(n, cut); ++i) {
      auto it = rels.find(ranked[i].docid);
      if (it != rels.end() && it->second >= rel_level) {
        rr = 1.0 / (i + 1);
        break;
      }
    }
    out.mrr.push_back(rr);
  }
  return out;
}

std::vector<long> parse_long_seq(PyObject* seq) {
  std::vector<long> out;
  PyObject* fast = PySequence_Fast(seq, "expected a sequence");
  if (!fast) return out;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  for (Py_ssize_t i = 0; i < n; ++i) {
    out.push_back(PyLong_AsLong(PySequence_Fast_GET_ITEM(fast, i)));
  }
  Py_DECREF(fast);
  return out;
}

double round5(double v) { return std::round(v * 100000.0) / 100000.0; }

PyObject* evaluate_files(PyObject*, PyObject* args) {
  const char* qrel_path;
  const char* run_path;
  PyObject* ks_obj;
  PyObject* mrr_obj;
  int rel_level = 1;
  if (!PyArg_ParseTuple(args, "ssOO|i", &qrel_path, &run_path, &ks_obj,
                        &mrr_obj, &rel_level)) {
    return nullptr;
  }
  std::vector<long> ks = parse_long_seq(ks_obj);
  std::vector<long> mrr_ks = parse_long_seq(mrr_obj);
  if (PyErr_Occurred()) return nullptr;

  QrelMap qrels;
  RunMap run;
  if (!read_qrels(qrel_path, &qrels)) {
    PyErr_SetString(PyExc_FileNotFoundError, qrel_path);
    return nullptr;
  }
  if (!read_run(run_path, &run)) {
    PyErr_SetString(PyExc_FileNotFoundError, run_path);
    return nullptr;
  }

  size_t nq = 0;
  std::vector<double> ndcg(ks.size()), map(ks.size()), recall(ks.size()),
      precision(ks.size());
  std::vector<double> mrr(mrr_ks.size());
  for (auto& kv : run) {
    auto qit = qrels.find(kv.first);
    if (qit == qrels.end() || qit->second.empty()) continue;
    rank_docs(&kv.second);
    QueryMetrics m =
        evaluate_query(kv.second, qit->second, ks, mrr_ks, rel_level);
    for (size_t i = 0; i < ks.size(); ++i) {
      ndcg[i] += m.ndcg[i];
      map[i] += m.map[i];
      recall[i] += m.recall[i];
      precision[i] += m.precision[i];
    }
    for (size_t i = 0; i < mrr_ks.size(); ++i) mrr[i] += m.mrr[i];
    nq++;
  }

  PyObject* result = PyDict_New();
  auto add_group = [&](const char* name, const char* prefix,
                       const std::vector<long>& cuts,
                       const std::vector<double>& vals) {
    PyObject* d = PyDict_New();
    for (size_t i = 0; i < cuts.size(); ++i) {
      char key[64];
      snprintf(key, sizeof(key), "%s@%ld", prefix, cuts[i]);
      double v = nq ? round5(vals[i] / nq) : 0.0;
      PyObject* fv = PyFloat_FromDouble(v);
      PyDict_SetItemString(d, key, fv);
      Py_DECREF(fv);
    }
    PyDict_SetItemString(result, name, d);
    Py_DECREF(d);
  };
  add_group("ndcg", "NDCG", ks, ndcg);
  add_group("map", "MAP", ks, map);
  add_group("recall", "Recall", ks, recall);
  add_group("precision", "P", ks, precision);
  add_group("mrr", "MRR", mrr_ks, mrr);
  PyObject* nq_obj = PyLong_FromSize_t(nq);
  PyDict_SetItemString(result, "num_queries", nq_obj);
  Py_DECREF(nq_obj);
  return result;
}

PyMethodDef methods[] = {
    {"evaluate_files", evaluate_files, METH_VARARGS,
     "evaluate_files(qrel_path, run_path, k_values, mrr_k_values, "
     "relevance_level=1) -> metrics dict"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_trec_native",
                      "Native TREC metrics", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__trec_native(void) { return PyModule_Create(&module); }
