"""Generate a bert-base-scale offline rehearsal: 12-layer random encoder +
a topical synthetic corpus large enough to exercise the IVF serving path.

The reference validates its pipeline only on MS MARCO (examples/*/1_prepare_
dataset.sh — unreachable from this zero-egress environment); this generator
produces a structurally similar workload: sparse qrels (few judged positives
per query), a subtopic hierarchy so dense retrieval is learnable but not
trivial, and documents long enough that truncation/pooling matter.

Structure: `n_topics` topics x `subtopics_per_topic` subtopics. Every doc
belongs to one subtopic and mixes subtopic words (precise signal), topic
words (coarse signal), and corpus-wide noise. A query names its subtopic;
its qrels judge a handful of same-subtopic docs (MS MARCO-style sparse
judgment of a larger true-relevant set).
"""
import argparse
import os

import numpy as np


def _write_corpus_vectorized(data_dir, rng, doc_sub, sub_words, topic_words,
                             noise_words, subtopics_per_topic,
                             chunk: int = 200_000):
    """MS MARCO-scale corpus writer (8.8M docs in minutes, not hours).

    All word picks are vectorized int draws; text assembly uses space-padded
    fixed-width byte columns concatenated by a dtype view (one C memcpy per
    chunk instead of 48 string joins per doc). Runs of spaces are harmless:
    the wordpiece tokenizer whitespace-splits. Word order is column-fixed
    (signal words interleaved among noise) rather than per-doc shuffled —
    equivalent for the retrieval task at this scale."""
    n = len(doc_sub)
    sub_arr = np.array(sub_words)         # (n_sub, 3)
    top_arr = np.array(topic_words)       # (n_topics, 4)
    noise_arr = np.array(noise_words)
    width = max(sub_arr.dtype.itemsize, top_arr.dtype.itemsize,
                noise_arr.dtype.itemsize) // 4 + 1  # chars incl pad space

    with open(os.path.join(data_dir, "corpus.tsv"), "wb") as f:
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            m = stop - start
            subs = doc_sub[start:stop]
            tops = subs // subtopics_per_topic
            cols = []
            # interleave: 6 sub picks, 10 topic picks, 32 noise picks
            for j in range(6):
                cols.append(sub_arr[subs, rng.integers(0, 3, size=m)])
            for j in range(10):
                cols.append(top_arr[tops, rng.integers(0, 4, size=m)])
            for j in range(32):
                cols.append(noise_arr[rng.integers(0, len(noise_arr), size=m)])
            body = np.zeros((m, len(cols)), dtype=f"S{width}")
            for j, c in enumerate(cols):
                body[:, j] = np.char.ljust(c.astype("S"), width)
            body_flat = body.view(f"S{width * len(cols)}").reshape(m)
            ids = np.char.add("d", np.arange(start, stop).astype("U")).astype("S")
            title = np.char.add(np.char.add(sub_arr[subs, 0].astype("S"), b" "),
                                top_arr[tops, 0].astype("S"))
            line = np.char.add(np.char.add(ids, b"\t"), title)
            line = np.char.add(np.char.add(line, b"\t"), body_flat)
            line = np.char.add(np.char.rstrip(line), b"\n")
            f.write(b"".join(line.tolist()))
            print(f"corpus: {stop}/{n}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="./synth_workspace")
    parser.add_argument("--n_docs", type=int, default=200_000)
    parser.add_argument("--n_train_queries", type=int, default=4000)
    parser.add_argument("--n_dev_queries", type=int, default=500)
    parser.add_argument("--n_topics", type=int, default=100)
    parser.add_argument("--subtopics_per_topic", type=int, default=20)
    parser.add_argument("--judged_per_query", type=int, default=4)
    parser.add_argument("--hidden_layers", type=int, default=12)
    parser.add_argument("--hidden_size", type=int, default=768)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    rng = np.random.default_rng(args.seed)
    n_sub = args.n_topics * args.subtopics_per_topic

    # vocabulary: per-subtopic words + per-topic words + shared noise
    sub_words = [f"sub{i:04d}a sub{i:04d}b sub{i:04d}c".split()
                 for i in range(n_sub)]
    topic_words = [f"top{i:03d}a top{i:03d}b top{i:03d}c top{i:03d}d".split()
                   for i in range(args.n_topics)]
    noise_words = [f"noise{i:04d}" for i in range(1500)]
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [w for ws in sub_words for w in ws]
             + [w for ws in topic_words for w in ws]
             + noise_words)

    torch.manual_seed(args.seed)
    model_dir = os.path.join(args.out_dir, "models", "synth-bert-base")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(model_dir, "vocab.txt"))
    tok.save_pretrained(model_dir)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=args.hidden_size,
                     num_hidden_layers=args.hidden_layers,
                     num_attention_heads=args.hidden_size // 64,
                     intermediate_size=4 * args.hidden_size,
                     max_position_embeddings=512, pad_token_id=0)
    BertModel(cfg, add_pooling_layer=False).save_pretrained(model_dir)

    data_dir = os.path.join(args.out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    doc_sub = rng.integers(0, n_sub, size=args.n_docs)
    if args.n_docs <= 500_000:
        with open(os.path.join(data_dir, "corpus.tsv"), "w") as f:
            for i in range(args.n_docs):
                s = int(doc_sub[i])
                t = s // args.subtopics_per_topic
                words = (list(rng.choice(sub_words[s], size=6))
                         + list(rng.choice(topic_words[t], size=10))
                         + list(rng.choice(noise_words, size=32)))
                rng.shuffle(words)
                title = f"{sub_words[s][0]} {topic_words[t][0]}"
                f.write(f"d{i}\t{title}\t{' '.join(words)}\n")
    else:
        _write_corpus_vectorized(data_dir, rng, doc_sub, sub_words,
                                 topic_words, noise_words,
                                 args.subtopics_per_topic)

    # per-subtopic doc inventory for qrels
    by_sub = [[] for _ in range(n_sub)]
    for i, s in enumerate(doc_sub):
        by_sub[s].append(i)

    for split, n in (("train", args.n_train_queries),
                     ("dev.small", args.n_dev_queries)):
        qf = open(os.path.join(data_dir, f"queries.{split}.tsv"), "w")
        rf = open(os.path.join(data_dir, f"qrels.{split}.tsv"), "w")
        for i in range(n):
            s = int(rng.integers(0, n_sub))
            while not by_sub[s]:
                s = int(rng.integers(0, n_sub))
            t = s // args.subtopics_per_topic
            qid = f"{split[:1]}q{i}"
            q_words = list(rng.choice(sub_words[s], size=2)) + \
                [topic_words[t][int(rng.integers(0, 4))]]
            qf.write(f"{qid}\t{' '.join(q_words)}\n")
            judged = rng.choice(by_sub[s],
                                size=min(args.judged_per_query, len(by_sub[s])),
                                replace=False)
            for d in judged:
                rf.write(f"{qid} 0 d{d} 1\n")
        qf.close(); rf.close()
    print(f"synthetic bert-base workspace at {args.out_dir}: "
          f"{args.n_docs} docs, {n_sub} subtopics, vocab {len(vocab)}")


if __name__ == "__main__":
    main()
