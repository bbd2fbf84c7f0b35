"""Binary segment ingest — the conv2tif analog (S1-S3).

The reference ingests per-epoch binary rasters: raw bytes + a header
schema + the epoch parsed from the FILENAME by regex
(shared.py:847-909 write_fullres_geotiff, gamma.py:79-171 header parse,
shared.py:1378-1382 + constants.py:70-73 the \\d{8} filename epochs),
with a file-size sanity check (shared.py:1014-1022).

The graft ingests WARC-ish crawl segments: files named
``segment-<epoch14>.bin`` holding newline-delimited records
``url \\x1f ts_unix \\x1f lang \\x1f text`` (UTF-8, \\x1f unit
separators). The pipeline:

- ``spark.read.format('binaryFile')`` scans the raw bytes (S1);
- an Arrow-batched mapInPandas splits records into typed columns (S2),
  one python pass per FILE, never per record-row in the driver;
- the segment epoch comes from the filename regex and is validated
  against every record's timestamp (S3 + the reference's
  name/content consistency checks);
- a declared-record-count trailer plays the file-size check role:
  mismatches raise, matching the reference's refusal to read
  truncated rasters.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

SEP = "\x1f"
PAGES_OUT = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string, segment_epoch timestamp")


def segment_payloads(pages: DataFrame,
                     segment: str = "1 day") -> DataFrame:
    """Distributed segment assembly: one grouped-map task per segment
    window builds that window's complete binary payload (records sorted
    by (url, ts), count trailer appended). Pure transformation — no
    side effects — so it runs on any cluster. Returns
    (seg string, payload binary, n long)."""
    win = F.window("warc_ts", segment)
    src = (pages
           .withColumn("_seg", F.date_format(win["start"],
                                             "yyyyMMddHHmmss"))
           .select("_seg", "url",
                   F.unix_timestamp("warc_ts").alias("ts_unix"),
                   "lang", "text"))

    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = pdf["_seg"].iloc[0]
        rs = pdf.sort_values(["url", "ts_unix"])
        body = "".join(
            f"{u}{SEP}{t}{SEP}{l}{SEP}{x}\n"
            for u, t, l, x in zip(rs["url"], rs["ts_unix"],
                                  rs["lang"], rs["text"]))
        payload = body.encode("utf-8") + f"#count={len(rs)}\n".encode()
        return pd.DataFrame({"seg": [seg], "payload": [payload],
                             "n": [len(rs)]})

    return (src.repartition("_seg").groupBy("_seg")
            .applyInPandas(build_one, "seg string, payload binary, n long"))


def write_segments(pages: DataFrame, out_dir: str,
                   segment: str = "1 day") -> int:
    """Serialise pages into per-window binary segment files named
    ``segment-<epoch14>.bin``. Payload assembly is distributed
    (``segment_payloads``); file EMISSION goes through the Hadoop
    FileSystem API (atomic tmp+rename), so it works identically on
    local FS, HDFS, and object stores — no executor-local ``open()``.
    Payloads stream through the driver one segment at a time
    (``toLocalIterator``): the file-per-segment naming contract makes
    the emitter a serial point by design; segment count is calendar-
    bounded (one per window), not data-bounded. For data-scale
    fan-out, write ``segment_payloads`` as a table instead. Returns
    the number of segments written."""
    spark = pages.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(out_dir)
    fs = base.getFileSystem(conf)
    fs.mkdirs(base)
    n = 0
    for row in segment_payloads(pages, segment).toLocalIterator():
        tmp = hpath(f"{out_dir}/.segment-{row['seg']}.tmp")
        dest = hpath(f"{out_dir}/segment-{row['seg']}.bin")
        out = fs.create(tmp, True)
        out.write(bytearray(row["payload"]))
        out.close()
        if fs.exists(dest):
            fs.delete(dest, False)
        fs.rename(tmp, dest)
        n += 1
    return n


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan -> typed pages rows. Raises on record-count
    mismatch or records whose timestamp falls outside their segment's
    filename epoch day (the reference's header/file consistency
    checks)."""
    raw = (spark.read.format("binaryFile")
           .load(f"{path}/segment-*.bin")
           .select("path", "content"))

    def decode(batches):
        import re
        for pdf in batches:
            out = {k: [] for k in ("url", "warc_ts", "html", "text",
                                   "lang", "segment_epoch")}
            for p, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"segment-(\d{14})\.bin$", p)
                if not m:
                    raise ValueError(f"unparseable segment name: {p}")
                seg_ts = dt.datetime.strptime(m.group(1), "%Y%m%d%H%M%S")
                text = bytes(content).decode("utf-8")
                lines = text.splitlines()
                if not lines or not lines[-1].startswith("#count="):
                    raise ValueError(f"missing count trailer in {p}")
                declared = int(lines[-1][len("#count="):])
                records = lines[:-1]
                if len(records) != declared:
                    raise ValueError(
                        f"truncated segment {p}: {len(records)} records, "
                        f"{declared} declared")
                for line in records:
                    url, ts_unix, lang, body = line.split(SEP, 3)
                    ts = dt.datetime.utcfromtimestamp(int(ts_unix))
                    if not (seg_ts <= ts < seg_ts + dt.timedelta(days=1)):
                        raise ValueError(
                            f"record ts {ts} outside segment {seg_ts} in {p}")
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(
                        f"<html><body>{body}</body></html>".encode())
                    out["text"].append(body)
                    out["lang"].append(lang)
                    out["segment_epoch"].append(seg_ts)
            yield pd.DataFrame(out)

    return raw.mapInPandas(decode, PAGES_OUT)
