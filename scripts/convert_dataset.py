#!/usr/bin/env python
"""Convert raw dataset files to the portable .npz interchange format.

Any dataset laplace_gnn_tpu.graph.datasets.load_data can parse from raw
files (Planetoid pickles, geom-gcn out1_* text files) is written as
``<out>/<name>.npz`` with arrays ``x`` (N, D) float32, ``y`` (N,) int64,
``edge_index`` (2, E) int64 — the format the npz loader and the scale CLI
consume directly (e.g. for ogbn-arxiv exports produced elsewhere).

    python scripts/convert_dataset.py cora --root ~/data --out ~/data
    python scripts/convert_dataset.py texas chameleon actor
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="+",
                   help="dataset names (cora/citeseer/pubmed, texas/"
                        "wisconsin/cornell, chameleon/squirrel, actor, ...)")
    p.add_argument("--root", default=None, help="raw-data root "
                   "(default: $LAPLACE_GNN_DATA or ~/data)")
    p.add_argument("--out", default=None, help="output dir (default: root)")
    args = p.parse_args()

    import numpy as np

    from laplace_gnn_tpu.graph import datasets

    root = args.root or datasets.default_root()
    out = args.out or root
    os.makedirs(out, exist_ok=True)
    for name in args.datasets:
        data = datasets.load_data(name, root=root)
        path = os.path.join(out, f"{name.lower()}.npz")
        np.savez_compressed(path, x=data.x.astype(np.float32),
                            y=data.y.astype(np.int64),
                            edge_index=data.edge_index.astype(np.int64))
        print(f"{name}: N={data.x.shape[0]} D={data.x.shape[1]} "
              f"E={data.edge_index.shape[1]} -> {path}")


if __name__ == "__main__":
    main()
