"""Column-level function library (SURVEY.md §2.8, §2.10).

Modules:
  * :mod:`determinism` — cross-engine (Spark vs DuckDB oracle) deterministic
    numeric/string rendering conventions.
  * :mod:`trajectory`  — trajectory struct builders + accessors (F5/F6, L2a).
  * :mod:`boxes`       — TBox/STBox algebra as Column expressions (F8-F10).
  * :mod:`serde`       — WKT / MF-JSON / WKB (de)serialization (F1-F4).
  * :mod:`text`        — tokenization / language-ID / quality scoring.
"""
