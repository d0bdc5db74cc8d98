"""Generate a fully-offline toy setup: tiny random BERT + synthetic corpus.

Lets the complete 10-stage pipeline run end-to-end in minutes with no
network or real checkpoints — the executable smoke test for the recipes
(the reference has no equivalent; its smallest config still needs MS MARCO).
"""
import argparse
import os

import numpy as np

WORDS = [f"w{i:02d}" for i in range(40)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="./toy_workspace")
    parser.add_argument("--n_docs", type=int, default=2000)
    parser.add_argument("--n_queries", type=int, default=200)
    args = parser.parse_args()

    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(0)
    model_dir = os.path.join(args.out_dir, "models", "toy-bert")
    os.makedirs(model_dir, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    with open(os.path.join(model_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(model_dir, "vocab.txt"))
    tok.save_pretrained(model_dir)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, pad_token_id=0)
    BertModel(cfg, add_pooling_layer=False).save_pretrained(model_dir)

    data_dir = os.path.join(args.out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    n_topics = 20
    with open(os.path.join(data_dir, "corpus.tsv"), "w") as f:
        for i in range(args.n_docs):
            filler = " ".join(rng.choice(WORDS[n_topics:], size=6))
            f.write(f"d{i}\ttitle {WORDS[i % n_topics]}\t{filler}\n")
    for split, n in (("train", args.n_queries), ("dev.small", 50)):
        with open(os.path.join(data_dir, f"queries.{split}.tsv"), "w") as f:
            for i in range(n):
                f.write(f"{split[:1]}q{i}\t{WORDS[i % n_topics]}\n")
        with open(os.path.join(data_dir, f"qrels.{split}.tsv"), "w") as f:
            for i in range(n):
                for j in range(args.n_docs):
                    if j % n_topics == i % n_topics and (j // n_topics) % 7 == 0:
                        f.write(f"{split[:1]}q{i} 0 d{j} 1\n")
    print(f"toy workspace at {args.out_dir}")


if __name__ == "__main__":
    main()
