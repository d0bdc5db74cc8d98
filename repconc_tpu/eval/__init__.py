from repconc_tpu.eval.trec import evaluate_run, pytrec_evaluate, truncate_run, parse_qrels, parse_run
from repconc_tpu.eval.run_io import (
    load_corpus,
    load_queries,
    load_beir_corpus,
    load_beir_queries,
    load_beir_qrels,
    load_qrels,
    write_run_tsv,
    concat_title_body,
)
