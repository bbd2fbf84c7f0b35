"""S10: auxiliary lookup-table crop + multilook centre-sampling.

Graft of /root/reference/pyrate/core/gamma.py:519-596
(read_lookup_table): the reference reads a per-pixel lookup table of
(range, azimuth) value pairs and, for a crop extent [min, max) and
multilook factors, keeps the CENTRE sample of every look window —
start index ``min + looks/2 - 1`` for even factors, ``min +
(looks-1)/2`` for odd (gamma.py:565-577) — pairing each selected
sample with the corresponding cell of the multilooked data set.

The graft's pixel grid is (y = day index, x = hour-of-day) over the
series; the lookup table is any dimension table keyed by that grid.
``lookup_table_select`` is the crop+centre-sample, ``multilook_tiles``
the matching crop+multilook average of the data grid, ``lookup_join``
the pairing. All three are pure column algebra — one aggregation for
the tiles, a broadcast hash join for the pairing (the selected lookup
is ~1/(xlooks*ylooks) of an already-small dimension table, so it
broadcasts at any data scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _centre_start(lo: int, looks: int) -> int:
    """gamma.py:565-577 — centre index of the first look window."""
    return lo + (looks // 2 - 1 if looks % 2 == 0 else (looks - 1) // 2)


def lookup_table_select(lt: DataFrame, xlooks: int, ylooks: int,
                        xmin: int, xmax: int, ymin: int, ymax: int,
                        row_col: str = "y",
                        col_col: str = "x") -> DataFrame:
    """Crop [ymin,ymax) x [xmin,xmax) and keep the centre sample of
    each (ylooks x xlooks) window, re-indexed to window ordinals
    (out_y, out_x). Only FULL windows are kept — (max-min)//looks per
    axis — matching the multilooked data-set extent the reference
    pairs against (its nrows/ncols come from the prepifg output)."""
    n_x = (xmax - xmin) // xlooks
    n_y = (ymax - ymin) // ylooks
    xs, ys = _centre_start(xmin, xlooks), _centre_start(ymin, ylooks)
    x, y = F.col(col_col), F.col(row_col)
    out_x = ((x - xs) / xlooks).cast("long")
    out_y = ((y - ys) / ylooks).cast("long")
    return (lt.where((x >= xs) & (x < xmax)
                     & (F.pmod(x - xs, F.lit(xlooks)) == 0)
                     & (y >= ys) & (y < ymax)
                     & (F.pmod(y - ys, F.lit(ylooks)) == 0))
            .withColumn("out_x", out_x)
            .withColumn("out_y", out_y)
            .where((F.col("out_x") < n_x) & (F.col("out_y") < n_y))
            .drop(row_col, col_col))


def multilook_tiles(cells: DataFrame, xlooks: int, ylooks: int,
                    xmin: int, xmax: int, ymin: int, ymax: int,
                    value_col: str = "value", row_col: str = "y",
                    col_col: str = "x") -> DataFrame:
    """Crop + multilook mean of the data grid with the same window
    geometry (the prepifg.prepare_ifg analog in grid space): one
    aggregation, (out_y, out_x, tile_avg, tile_n)."""
    n_x = (xmax - xmin) // xlooks
    n_y = (ymax - ymin) // ylooks
    x, y = F.col(col_col), F.col(row_col)
    src = (cells.where((x >= xmin) & (x < xmin + n_x * xlooks)
                       & (y >= ymin) & (y < ymin + n_y * ylooks))
           .withColumn("out_x", ((x - xmin) / xlooks).cast("long"))
           .withColumn("out_y", ((y - ymin) / ylooks).cast("long")))
    return (src.groupBy("out_y", "out_x")
            .agg(F.avg(value_col).alias("tile_avg"),
                 F.count(value_col).alias("tile_n")))


def lookup_join(tiles: DataFrame, selected: DataFrame) -> DataFrame:
    """Pair every multilooked tile with its centre-sampled lookup
    values. The selected lookup side is explicitly broadcast."""
    return tiles.join(F.broadcast(selected), ["out_y", "out_x"], "left")
