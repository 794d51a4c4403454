"""BFS / PageRank / connected components over semiring SpMV.

Run: python examples/04_graph_algorithms.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tpusparse import graph
from tpusparse.io import builder

g = builder.power_law_coo(5000, 5000, avg_nnz_per_row=6.0, seed=0)
level = graph.bfs(g, source=0)
pr = graph.pagerank(g)
cc = graph.connected_components(g)
print(f"bfs reached {(level >= 0).sum()} vertices (max depth {level.max()})")
print(f"pagerank mass {pr.sum():.4f}, top vertex {int(np.argmax(pr))}")
print(f"{len(np.unique(cc))} connected components")
