"""pyrate_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine.

Recasts the per-pixel inversion pipeline of the reference
(GeoscienceAustralia/PyRate, studied at /root/reference) as per-key
(per-``url``) gap-filled rollups over a table of Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)``:

- pixel (row, col)            -> key column ``url``
- epoch date                  -> ``warc_ts`` timestamp
- interferogram (epoch pair)  -> pairwise-delta observation row
- 3-D cube [nifgs, r, c]      -> long DataFrame, grouped-map pandas UDFs
- multilook/prepifg           -> tumbling-window tier rollups (hour/day/week)

All heavy math is numpy inside Arrow-batched ``applyInPandas`` groups
(no per-row Python); the relational skeleton is plain DataFrame/Catalyst.
"""

__version__ = "0.1.0"

DAYS_PER_YEAR = 365.25  # reference: pyrate/core/ifgconstants.py:128
