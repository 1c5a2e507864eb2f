#!/usr/bin/env python
"""Download the reference's benchmark datasets in raw form (network needed).

Mirrors what torch_geometric downloads for the reference's loaders
(gnn/utils.py:203-322), from the same upstream sources:

  - Planetoid (cora/citeseer/pubmed): github.com/kimiyoung/planetoid raw
    ``ind.<name>.*`` files;
  - WebKB (texas/wisconsin/cornell), WikipediaNetwork (chameleon/squirrel),
    Actor (film): github.com/graphdml-uiuc-jlu/geom-gcn ``out1_*`` files.

Files land under ``<root>/<Name>/raw`` exactly where
laplace_gnn_tpu.graph.datasets.load_data expects them.

    python scripts/fetch_datasets.py cora texas actor --root ~/data
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

PLANETOID_URL = ("https://github.com/kimiyoung/planetoid/raw/master/data/"
                 "ind.{name}.{ext}")
PLANETOID_EXTS = ("x", "tx", "allx", "y", "ty", "ally", "graph", "test.index")

GEOM_GCN_URL = ("https://raw.githubusercontent.com/graphdml-uiuc-jlu/"
                "geom-gcn/master/new_data/{dirname}/{fname}")
GEOM_GCN_FILES = ("out1_node_feature_label.txt", "out1_graph_edges.txt")
# geom-gcn directory names (Actor is stored as 'film')
GEOM_GCN_DIRS = {"texas": "texas", "wisconsin": "wisconsin",
                 "cornell": "cornell", "chameleon": "chameleon",
                 "squirrel": "squirrel", "actor": "film"}
PLANETOID = ("cora", "citeseer", "pubmed")


def fetch(url: str, dest: str) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.exists(dest):
        print(f"  exists: {dest}")
        return
    print(f"  {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="+")
    p.add_argument("--root", default=None)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from laplace_gnn_tpu.graph import datasets as D

    root = args.root or D.default_root()
    for name in args.datasets:
        name = name.lower()
        print(f"{name}:")
        if name in PLANETOID:
            raw = os.path.join(root, name.capitalize(), "raw")
            for ext in PLANETOID_EXTS:
                fetch(PLANETOID_URL.format(name=name, ext=ext),
                      os.path.join(raw, f"ind.{name}.{ext}"))
        elif name in GEOM_GCN_DIRS:
            raw = os.path.join(root, name, "raw")
            for fname in GEOM_GCN_FILES:
                fetch(GEOM_GCN_URL.format(dirname=GEOM_GCN_DIRS[name],
                                          fname=fname),
                      os.path.join(raw, fname))
        else:
            raise SystemExit(f"unknown dataset {name}")


if __name__ == "__main__":
    main()
