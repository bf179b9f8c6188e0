"""Avro codec parity vs the Apache Avro JAVA library (avro-1.12.1.jar
on the PySpark classpath) — the independent oracle for
`sources/avro.py`, same pattern as the JPEG/ImageIO oracle.

Both directions:
  * files written by our encoder are read back by
    org.apache.avro.file.DataFileReader (so real Java Iceberg stacks
    can read the manifests we commit);
  * files written by org.apache.avro.file.DataFileWriter are read by
    our decoder (so we can read manifests real writers committed).
"""

import json
import os

import pytest

from tantivy_spark.sources import avro

SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "tags", "type": {
                    "type": "map", "values": "string"}},
                {"name": "ids", "type": {
                    "type": "array", "items": "long"}},
            ]}},
    ]}

RECORDS = [
    {"status": 1, "snapshot_id": 7070707070707,
     "data_file": {"file_path": "/data/ünïcode-00001.parquet",
                   "partition": {}, "record_count": 123456789,
                   "file_size_in_bytes": 987654321,
                   "tags": {"k1": "v1", "k2": "v2"},
                   "ids": [1, -2, 3 ** 15, 0]}},
    {"status": 0, "snapshot_id": None,
     "data_file": {"file_path": "", "partition": {}, "record_count": 0,
                   "file_size_in_bytes": -1, "tags": {}, "ids": []}},
]


def test_roundtrip_both_codecs(tmp_path):
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        avro.write_container(p, json.dumps(SCHEMA), RECORDS, codec=codec)
        schema, meta, recs = avro.read_container(p)
        assert recs == RECORDS
        assert meta["avro.codec"] == codec.encode()


def test_roundtrip_empty_and_negative_longs(tmp_path):
    p = str(tmp_path / "edge.avro")
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]}
    vals = [{"v": x} for x in
            (0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1,
             -(2**63))]
    avro.write_container(p, json.dumps(sch), vals)
    assert avro.read_container(p)[2] == vals
    avro.write_container(p, json.dumps(sch), [])
    assert avro.read_container(p)[2] == []


# ---------------------------------------------------------------------------
# JVM oracle
# ---------------------------------------------------------------------------


def _jvm_read(spark, path):
    """Read an avro container with the Java library; return records as
    python dicts (the subset of shapes SCHEMA uses)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    out = []
    while reader.hasNext():
        rec = reader.next()
        df = rec.get("data_file")
        tags = df.get("tags")
        ids = df.get("ids")
        out.append({
            "status": rec.get("status"),
            "snapshot_id": rec.get("snapshot_id"),
            "data_file": {
                "file_path": df.get("file_path").toString(),
                "partition": {},
                "record_count": df.get("record_count"),
                "file_size_in_bytes": df.get("file_size_in_bytes"),
                "tags": {str(k): tags.get(k).toString()
                         for k in tags.keySet().toArray()},
                "ids": [ids.get(i) for i in range(ids.size())],
            }})
    reader.close()
    return out


def test_jvm_reads_our_files(spark, tmp_path):
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"ours_{codec}.avro")
        avro.write_container(p, json.dumps(SCHEMA), RECORDS, codec=codec)
        assert _jvm_read(spark, p) == RECORDS


def test_we_read_jvm_files(spark, tmp_path):
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    df_sch = sch.getField("data_file").schema()
    p = str(tmp_path / "jvm.avro")
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(sch, jvm.java.io.File(p))
    Long = jvm.java.lang.Long
    for r in RECORDS:
        jr = jvm.org.apache.avro.generic.GenericData.Record(sch)
        jr.put("status", r["status"])
        jr.put("snapshot_id",
               None if r["snapshot_id"] is None
               else Long.valueOf(r["snapshot_id"]))
        jdf = jvm.org.apache.avro.generic.GenericData.Record(df_sch)
        d = r["data_file"]
        jdf.put("file_path", d["file_path"])
        jdf.put("partition", jvm.org.apache.avro.generic.GenericData.Record(
            df_sch.getField("partition").schema()))
        jdf.put("record_count", Long.valueOf(d["record_count"]))
        jdf.put("file_size_in_bytes", Long.valueOf(d["file_size_in_bytes"]))
        tags = jvm.java.util.HashMap()
        for k, v in d["tags"].items():
            tags.put(k, v)
        jdf.put("tags", tags)
        ids = jvm.java.util.ArrayList()
        for x in d["ids"]:
            ids.add(Long.valueOf(x))
        jdf.put("ids", ids)
        jr.put("data_file", jdf)
        w.append(jr)
    w.close()
    schema, meta, recs = avro.read_container(p)
    assert meta["avro.codec"] == b"deflate"
    assert recs == RECORDS
