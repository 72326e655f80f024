"""powergraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of GraphLab PowerGraph v2.2
(reference: jegonzal/PowerGraph) as Ray Data pipelines:

- graph construction from Parquet source-code-repository tables
  (``sources.repo_table`` + ``stages.edge_builder``) and from the reference's
  text formats (``sources.parsers``),
- Gather-Apply-Scatter vertex programs (PageRank, connected components,
  community label propagation, SSSP, k-core, approximate diameter) run by a
  BSP superstep engine over per-partition CSR state held in Ray actors
  (``graph.gas``),
- non-iterative join pipelines (triangle counting, degree tables) expressed
  purely as ``Dataset`` transforms (``graph.triangles``, ``stages.degrees``),
- training-data pipeline operators (dedup families, text analysis, ANN
  similarity search, multimodal plumbing) in ``stages``.

No code is copied from the reference; file:line citations in docstrings point
at the semantics being reproduced.
"""

__version__ = "0.1.0"

# Apply the numpy huge-page fault-tax fix in every process that loads this
# package (driver, Ray workers, CLI): see ids.disable_numpy_hugepage for the
# measurement. Runtime toggle — safe after numpy is already imported.
from .ids import disable_numpy_hugepage as _disable_numpy_hugepage

_disable_numpy_hugepage()
