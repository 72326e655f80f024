"""SIR epidemic cascades (apps/cascades/cascades.cpp) as a GAS program.

The reference app simulates an SIR (susceptible / infected / recovered)
contagion over the graph: each superstep an INFECTED vertex rolls for
recovery (cascades.cpp:134-138), and a SUSCEPTIBLE vertex rolls once per
infected neighbor for infection (cascades.cpp:139-146) — the gather counts
infected neighbors over ALL edges (cascades.cpp:103-118).

Deterministic adaptation (documented deltas from the reference):

- **Rolls are splitmix64 hashes, not ``rand()``** (cascades.cpp:184
  ``srand(time(0))``): the infection roll for receiver ``v`` from infected
  neighbor ``u`` at superstep ``t`` is
  ``integer_mix(v·C_RECV + u·C_SRC + t·C_IT + mix(seed)) < p_inf·2^64``
  (one roll per infected neighbor — exactly the reference's per-neighbor
  dice loop, but replayable bit-for-bit by the DuckDB oracle and invariant
  to partition count / edge order). The recovery roll hashes the vertex id
  alone. Thresholds are exact integers ``int(p · 2^64)`` so the comparison
  never touches floats.
- **Dense supersteps.** The reference signals only vertices that END a
  superstep infected (cascades.cpp:151-153) with ``scatter_edges =
  NO_EDGES``, so a susceptible vertex is never re-activated and the
  contagion cannot actually spread past the seed set — an app bug noted
  here and replaced by the evident intent: every vertex is evaluated every
  superstep for ``--iterations`` supersteps (the app's own flag,
  cascades.cpp:199), stopping early when no vertex is infected.
- **Initial status** comes either from a caller array (the reference's
  per-line ``S``/``I``/``R`` labels, cascades.cpp:61-80) or from a
  deterministic hash fraction (``integer_mix(vid·C_INIT + mix(seed)) <
  frac·2^64``), the form the SQL oracle replays.

The per-edge rolls hash GLOBAL vids (``wants_vids`` kernel) so the oracle
recursion runs over the original id space.
"""

from __future__ import annotations

import numpy as np

from ..ids import integer_mix, prob_threshold
from .gas import (GASEngine, Graph, VertexProgram, chunks_to_dataset,
                  split_dense)

# status encoding — this module's own ordering (S=0, I=1, R=2; chosen so
# init state is the zero array). The reference's enum (cascades.cpp:29)
# orders {INFECTED=0, SUSCEPTIBLE=1, RECOVERED=2}; only the S/I/R letters
# are externally visible, so the numeric order is a free choice here.
SUSCEPTIBLE = np.uint8(0)
INFECTED = np.uint8(1)
RECOVERED = np.uint8(2)

# distinct odd stream multipliers for the roll inputs (any fixed odd
# constants work; these are the splitmix finalizer constants + golden ratio)
C_RECV = np.uint64(0xFF51AFD7ED558CCD)
C_SRC = np.uint64(0xC4CEB9FE1A85EC53)
C_IT = np.uint64(0x9E3779B97F4A7C15)
C_REC = np.uint64(0xBF58476D1CE4E5B9)
C_INIT = np.uint64(0x94D049BB133111EB)

# Re-exported for importers: the generic threshold helper lives in ids.py
# next to integer_mix (the SQL oracle embeds the SAME integer literals).
__all__ = ["SIRCascadeVP", "run_sir", "sir_oracle", "prob_threshold"]


class SIRCascadeVP(VertexProgram):
    """Gather = any-successful-infection-roll OR-monoid over ALL edges;
    apply = recovery roll for I, adopt infection for hit S (cascades.cpp
    gather/apply, determinized per the module docstring)."""

    name = "sir_cascade"
    broadcast_keys = ("value",)
    shardable = True
    supports_chunk_init = True
    wants_vids = True

    def __init__(self, infection_chance: float, recovery_chance: float,
                 iterations: int, seed: int = 7,
                 init_frac: float | None = 0.02,
                 init_status: np.ndarray | None = None,
                 model: str = "SIR") -> None:
        assert iterations > 0
        assert model in ("SIR", "SIS"), model
        # SIS: a successful recovery roll returns the vertex to S
        # (reinfectable) instead of R — the endemic-equilibrium variant;
        # SI is just recovery_chance=0 under either model
        self.model = model
        self.inf_thresh = prob_threshold(infection_chance)
        self.rec_thresh = prob_threshold(recovery_chance)
        self.iterations = int(iterations)
        self.seedmix = integer_mix(np.uint64(seed))
        self.init_frac = init_frac
        self.init_status = init_status
        self.init_thresh = (prob_threshold(init_frac)
                            if init_frac is not None else None)

    # -- init ---------------------------------------------------------------
    def _hash_init(self, gv: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            roll = integer_mix(gv.astype(np.uint64) * C_INIT + self.seedmix)
        return np.where(roll < self.init_thresh, INFECTED, SUSCEPTIBLE)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        gv = np.asarray(vids[lo:hi], np.uint64)
        if self.init_status is not None:
            st = np.asarray(self.init_status[lo:hi], np.uint8).copy()
        else:
            st = self._hash_init(gv)
        return {"value": st, "gvid": gv.copy()}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return self.init_chunk(0, graph.nv, graph.nv, graph.vids, None, None)

    # -- gather -------------------------------------------------------------
    def partial_vids(self, src, dst, vids, nv, iteration, value):
        """hit[v] = OR over infected neighbors u of
        (mix(v·C_RECV + u·C_SRC + t·C_IT + seedmix) < inf_thresh) —
        one independent roll per (infected neighbor, superstep), the
        reference's per-neighbor dice loop (cascades.cpp:139-146)."""
        hit = np.zeros(nv, bool)
        with np.errstate(over="ignore"):
            t_term = np.uint64(iteration) * C_IT + self.seedmix
        for a, b in ((src, dst), (dst, src)):  # infected a → receiver b
            m = (value[a] == INFECTED) & (value[b] == SUSCEPTIBLE)
            if not m.any():
                continue
            ga = np.asarray(vids, np.uint64)[a[m]]
            gb = np.asarray(vids, np.uint64)[b[m]]
            with np.errstate(over="ignore"):
                roll = integer_mix(gb * C_RECV + ga * C_SRC + t_term)
            w = roll < self.inf_thresh
            hit[b[m][w]] = True
        return hit

    @staticmethod
    def merge(a, b):
        return a | b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    # -- apply --------------------------------------------------------------
    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        st = bundle["value"]
        gv = bundle["gvid"]
        new = st.copy()
        inf = st == INFECTED
        if inf.any():
            with np.errstate(over="ignore"):
                roll = integer_mix(gv[inf] * C_REC
                                   + np.uint64(iteration) * C_IT
                                   + self.seedmix + np.uint64(1))
            rec = roll < self.rec_thresh
            new[np.flatnonzero(inf)[rec]] = (RECOVERED if self.model == "SIR"
                                             else SUSCEPTIBLE)
        new[(st == SUSCEPTIBLE) & total] = INFECTED
        n_inf = int((new == INFECTED).sum())
        n_active = n_inf if iteration + 1 < self.iterations else 0
        return ({"value": new, "gvid": gv}, n_active, float(n_inf))

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def run_sir(graph: Graph, infection_chance: float, recovery_chance: float,
            iterations: int, seed: int = 7, init_frac: float | None = 0.02,
            init_status: np.ndarray | None = None, model: str = "SIR",
            checkpoint_path: str | None = None, resume: bool = False,
            result: str = "arrays"):
    """→ (vids, status uint8 array, engine) after ``iterations``
    supersteps (early-stop when no vertex is infected). ``init_status``
    (aligned with ``graph.vids``) overrides the hash-fraction seeding;
    ``model="SIS"`` makes recovery return to S (reinfectable);
    ``recovery_chance=0`` gives the pure SI contagion."""
    vp = SIRCascadeVP(infection_chance, recovery_chance, iterations,
                      seed=seed, init_frac=init_frac,
                      init_status=init_status, model=model)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path,
                    resume=resume, max_iterations=iterations)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return (chunks_to_dataset(graph, eng.bounds, chunks,
                                  lambda c: {"status": c["value"]}), eng)
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


def sir_oracle(src: np.ndarray, dst: np.ndarray, vids: np.ndarray,
               status0: np.ndarray, infection_chance: float,
               recovery_chance: float, iterations: int,
               seed: int = 7, model: str = "SIR") -> np.ndarray:
    """Sequential single-process replay (test oracle): same hashes, plain
    loops over a dict-of-sets adjacency."""
    inf_t = prob_threshold(infection_chance)
    rec_t = prob_threshold(recovery_chance)
    seedmix = integer_mix(np.uint64(seed))
    pos = {int(v): i for i, v in enumerate(vids)}
    st = np.asarray(status0, np.uint8).copy()
    nbrs: dict[int, set[int]] = {int(v): set() for v in vids}
    for s, d in zip(src, dst):
        nbrs[int(s)].add(int(d))
        nbrs[int(d)].add(int(s))
    for t in range(iterations):
        if not (st == INFECTED).any():
            break
        new = st.copy()
        for v in vids:
            v = int(v)
            i = pos[v]
            if st[i] == RECOVERED:
                continue
            if st[i] == INFECTED:
                with np.errstate(over="ignore"):
                    roll = integer_mix(np.uint64(v) * C_REC
                                       + np.uint64(t) * C_IT
                                       + seedmix + np.uint64(1))
                if roll < rec_t:
                    new[i] = RECOVERED if model == "SIR" else SUSCEPTIBLE
                continue
            for u in nbrs[v]:
                if st[pos[u]] != INFECTED:
                    continue
                with np.errstate(over="ignore"):
                    roll = integer_mix(np.uint64(v) * C_RECV
                                       + np.uint64(u) * C_SRC
                                       + np.uint64(t) * C_IT + seedmix)
                if roll < inf_t:
                    new[i] = INFECTED
                    break
        st = new
    return st
