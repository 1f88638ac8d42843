"""Graph-embedding pretraining → warm-started CTR model.

Counterpart of the reference flow ``feature_tool.generator_item_embedding``
(DeepWalk over click graphs → ``pre_weight``) + ``model_test`` dispatcher.

    python examples/pretrain_embeddings.py --method deepwalk
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="deepwalk",
                    choices=["deepwalk", "node2vec", "line", "sdne"])
    ap.add_argument("--edgelist", default=None,
                    help="optional 'src dst' edgelist file")
    ap.add_argument("--dim", type=int, default=8)
    args = ap.parse_args()

    from ml_function_tpu.embedding_pretrain import (DeepWalk, Line, Node2Vec,
                                                    SDNE, from_edges,
                                                    read_edgelist)
    from ml_function_tpu.embedding_pretrain.evaluate import cosine_class_gap

    if args.edgelist:
        g = read_edgelist(args.edgelist)
    else:  # synthetic two-community graph
        rng = np.random.default_rng(0)
        edges = []
        for base in (0, 30):
            for _ in range(300):
                a, b = rng.integers(0, 30, 2)
                edges.append((f"n{base+a}", f"n{base+b}", 1.0))
        edges += [("n29", "n30", 1.0), ("n30", "n29", 1.0)]
        g = from_edges(edges)

    cls = {"deepwalk": DeepWalk, "node2vec": Node2Vec, "line": Line,
           "sdne": SDNE}[args.method]
    embs = cls(g, dim=args.dim).transform() if args.method != "sdne" \
        else cls(g, hidden=(64, args.dim)).transform()
    print(f"{args.method}: {len(embs)} nodes embedded, dim "
          f"{next(iter(embs.values())).shape[0]}")
    labels = {n: 0 if int(n[1:]) < 30 else 1 for n in embs}
    print("community cosine gap:", round(cosine_class_gap(embs, labels), 4))

    # warm-start a CTR embedding table from these vectors
    from ml_function_tpu.embedding_pretrain import pre_weight_from_embeddings
    vocab = {n: i + 1 for i, n in enumerate(sorted(embs))}
    w = pre_weight_from_embeddings(embs, vocab, vocab_size=len(vocab) + 1)
    print("pre_weight matrix:", w.shape, "→ FusedEmbedding.init(pre_weight=...)")


if __name__ == "__main__":
    main()
