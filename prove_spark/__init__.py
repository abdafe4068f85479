"""prove_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-creates the *semantics* of King-s-Knowledge-Graph-Lab/ProVe's
verbalize-and-verify pipeline (see /root/reference, SURVEY.md) as idiomatic
Spark DataFrame stages over tables of multi-turn conversation transcripts:

    transcripts ─ turn assembly (W4) ─ sentence split + slide-2 (C2/C3)
        ├─ claim/mention detection (vectorized pandas kernel in mapInPandas)
        ├─ entity linking (broadcast alias dictionary join J7 + disambiguation)
        ├─ template verbalization (C5/C6)
        ├─ evidence pairing (J9) + lexical retrieval scoring (M2) + top-k (W1)
        ├─ NLI-style entailment (M3) + verdict algebra (A2-A5)
        ├─ connected-components canonicalization
        └─ materialized `triples` / `entities` tables (+ checkpoint manifest)

Not a port: the reference is single-process pandas + HTTP; this engine is
declarative DataFrame/Catalyst with Arrow-batched kernels only where Spark
has no built-in (regex mention detection, deterministic model stand-ins).
"""

__version__ = "0.1.0"
