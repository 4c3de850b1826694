"""Export small REAL graphs (networkx's embedded classics) as MatrixMarket
``.mtx`` + label ``.npz`` artifacts, checked into ``data/real/``.

The reference's autotuner consumes graphs as ``.mtx`` files
(``/root/reference/README.md:147-168``, ``autotuner/findbestk.py``); these
artifacts exercise the same ingestion path (``isplib_tpu.from_scipy``)
with genuinely real-world adjacency structure and labels — the
environment has no network access, so the six large reference datasets
can only be size-matched stand-ins, but these two are the real thing:

* ``karate``  — Zachary's karate club (34 nodes, 78 edges, 2 factions).
* ``lesmis``  — Les Misérables character co-appearances (77 nodes,
  254 weighted edges; labels = greedy-modularity communities).

Run once: ``python scripts/export_real_mtx.py`` (requires networkx+scipy,
both baked into this image).  Idempotent.
"""

from __future__ import annotations

import os

import networkx as nx
import numpy as np
import scipy.io
import scipy.sparse as sp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "real")


def export(name: str, g: "nx.Graph", y: np.ndarray) -> None:
    os.makedirs(OUT, exist_ok=True)
    nodes = sorted(g.nodes())
    idx = {n: i for i, n in enumerate(nodes)}
    rows, cols, vals = [], [], []
    for u, v, d in g.edges(data=True):
        w = float(d.get("weight", 1.0))
        rows += [idx[u], idx[v]]
        cols += [idx[v], idx[u]]
        vals += [w, w]
    a = sp.coo_matrix((vals, (rows, cols)),
                      shape=(len(nodes), len(nodes)))
    scipy.io.mmwrite(os.path.join(OUT, f"{name}.mtx"), a)
    np.savez(os.path.join(OUT, f"{name}_labels.npz"), y=y.astype(np.int32))
    print(f"{name}: {a.shape[0]} nodes, {a.nnz} directed edges, "
          f"{y.max() + 1} classes")


def main():
    g = nx.karate_club_graph()
    y = np.array([0 if g.nodes[n]["club"] == "Mr. Hi" else 1
                  for n in sorted(g.nodes())])
    export("karate", g, y)

    g = nx.les_miserables_graph()
    comms = nx.community.greedy_modularity_communities(g, weight="weight")
    nodes = sorted(g.nodes())
    idx = {n: i for i, n in enumerate(nodes)}
    y = np.zeros(len(nodes), np.int32)
    for c, members in enumerate(comms):
        for n in members:
            y[idx[n]] = c
    export("lesmis", g, y)


if __name__ == "__main__":
    main()
