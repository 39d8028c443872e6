"""Ray-Data-native record-linkage engine.

A from-scratch re-derivation of the *capabilities* of the reference
``uk_address_matcher`` (a DuckDB/Splink Fellegi-Sunter address matcher) as
idiomatic ``ray.data.Dataset`` pipelines over zero-copy Arrow batches, built
for Parquet tables of source-code repositories
``(repo, path, commit, lang, content)`` at very large scale.

Layout
------
- ``functions``  : pure vectorised kernels (regex chains, string metrics).
- ``stages``     : ``Dataset -> Dataset`` batch transforms (cleaning, TF,
  blocking, scoring, rescoring, clustering, dedup, similarity, text).
- ``pipelines``  : compositions of stages + the ``@stage`` framework.
- ``sources``    : readers/writers (column-pruned parquet, CSV, manifests).
- ``state``      : model loading (Fellegi-Sunter comparison spec) and
  checkpoint/lineage utilities.

Nothing in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"
