"""Ray-Data-native Chinese open-relation-extraction / KG-construction engine.

Brand-new engine (not a port) with the capabilities of
Teddy-Li/Chinese-Open-Relation-Extraction-for-EntGraph, re-expressed as
streaming ``ray.data.Dataset`` stages over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts).

Layout:
    functions/  pure per-sentence rule logic (no Ray): text normalization,
                dependency-tree triple extraction, amendment cascade, filters
    sources/    synthetic transcript generation + parquet IO helpers
    stages/     Ray Data stage wrappers (map_batches fns / actor classes)
    pipelines/  end-to-end pipeline builders with checkpoint/lineage
    state/      lineage + metrics checkpoint store
"""

__version__ = "0.1.0"
