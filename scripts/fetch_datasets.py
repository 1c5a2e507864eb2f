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

After downloading, each dataset is PARSED and validated against the
published (N, D, C) shape facts (EXPECTED_SHAPES below) so a broken or
truncated download fails loudly instead of producing silent garbage — then
its raw-file SHA256s are recorded to ``<root>/checksums.json`` and, when
``scripts/dataset_checksums.json`` carries pinned values (populated by
``--record`` on the first trusted networked run; this build environment has
no egress, so they cannot be pre-pinned here), verified against them.

    python scripts/fetch_datasets.py cora texas actor --root ~/data
    python scripts/fetch_datasets.py cora --record   # pin checksums
"""

from __future__ import annotations

import argparse
import hashlib
import json
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

# Published dataset facts (N nodes, D features, C classes) — the turnkey
# sanity gate for BASELINE.md metric 3. Sources: Planetoid (Yang et al.
# 2016) and geom-gcn (Pei et al. 2020) as loaded by the reference's
# torch_geometric loaders (gnn/utils.py:203-322).
EXPECTED_SHAPES = {
    "cora": (2708, 1433, 7),
    "citeseer": (3327, 3703, 6),
    "pubmed": (19717, 500, 3),
    "texas": (183, 1703, 5),
    "wisconsin": (251, 1703, 5),
    "cornell": (183, 1703, 5),
    "chameleon": (2277, 2325, 5),
    "squirrel": (5201, 2089, 5),
    "actor": (7600, 932, 5),
}

PINNED_CHECKSUMS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "dataset_checksums.json")


def fetch(url: str, dest: str) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.exists(dest):
        print(f"  exists: {dest}")
        return
    print(f"  {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def raw_files(name: str, root: str) -> list[str]:
    if name in PLANETOID:
        raw = os.path.join(root, name.capitalize(), "raw")
        return [os.path.join(raw, f"ind.{name}.{ext}")
                for ext in PLANETOID_EXTS]
    raw = os.path.join(root, name, "raw")
    return [os.path.join(raw, f) for f in GEOM_GCN_FILES]


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate_dataset(name: str, root: str) -> tuple[int, int, int]:
    """Parse the downloaded raw files and check the published shape facts.

    Returns (N, D, C); raises ValueError on mismatch — a truncated or
    wrong-format download must not silently feed the quality run."""
    from laplace_gnn_tpu.graph import datasets as D

    data = D.load_data(name, root=root)
    got = (int(data.num_nodes), int(data.num_features),
           int(data.num_classes))
    want = EXPECTED_SHAPES.get(name)
    if want is not None and got != want:
        raise ValueError(
            f"{name}: parsed (N, D, C)={got} does not match the published "
            f"{want} — the download is corrupt or the format changed")
    print(f"  validated: N={got[0]} D={got[1]} C={got[2]} "
          f"E={data.edge_index.shape[1]}")
    return got


def checksum_manifest(names, root: str, record: bool = False) -> dict:
    """Record per-file SHA256s to <root>/checksums.json; verify against
    scripts/dataset_checksums.json when it pins values for a dataset."""
    pinned = {}
    if os.path.exists(PINNED_CHECKSUMS):
        with open(PINNED_CHECKSUMS) as f:
            pinned = json.load(f)
    manifest = {}
    for name in names:
        for path in raw_files(name, root):
            digest = sha256_of(path)
            key = f"{name}/{os.path.basename(path)}"
            manifest[key] = digest
            if key in pinned and pinned[key] != digest:
                raise ValueError(
                    f"checksum mismatch for {key}: got {digest}, "
                    f"pinned {pinned[key]}")
    out = os.path.join(root, "checksums.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"checksums -> {out}")
    if record:
        pinned.update(manifest)
        with open(PINNED_CHECKSUMS, "w") as f:
            json.dump(pinned, f, indent=1, sort_keys=True)
        print(f"pinned -> {PINNED_CHECKSUMS}")
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="+")
    p.add_argument("--root", default=None)
    p.add_argument("--no-validate", action="store_true",
                   help="skip the parse + published-shape check")
    p.add_argument("--record", action="store_true",
                   help="pin the downloaded files' SHA256s into "
                        "scripts/dataset_checksums.json")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
        __file__)), ".."))
    from laplace_gnn_tpu.graph import datasets as D

    root = args.root or D.default_root()
    names = [n.lower() for n in args.datasets]
    for name in names:
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
        if not args.no_validate:
            validate_dataset(name, root)
    checksum_manifest(names, root, record=args.record)


if __name__ == "__main__":
    main()
