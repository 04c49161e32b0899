"""CLI parity tests: create/insert/check/show/bench mirror the reference
binary's behavior (``poppy/src/bin/poppy.rs``)."""

import io
import os
import sys

import pytest

from poppy_spark.__main__ import main
from poppy_spark.core import load


@pytest.fixture()
def wordfile(tmp_path):
    p = tmp_path / "words.txt"
    p.write_text("".join(f"word-{i:05d}\n" for i in range(5000)))
    return str(p)


class TestCli:
    def test_create_uses_exact_line_count_as_capacity(self, tmp_path, wordfile):
        out = str(tmp_path / "f.pop")
        assert main(["create", "-p", "0.01", out, wordfile]) == 0
        bf = load(out)
        assert bf.capacity == 5000
        assert bf.contains_bytes("word-00000")
        assert not bf.contains_bytes("missing-key-123456")

    def test_check_and_verify(self, tmp_path, wordfile, capsys):
        out = str(tmp_path / "f.pop")
        main(["create", out, wordfile])
        main(["check", out, wordfile])
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 5000  # every member prints (zero FN)
        probe = tmp_path / "probe.txt"
        probe.write_text("word-00001\nabsent-entry-zz\n")
        main(["check", "--verify", out, str(probe)])
        nok = capsys.readouterr().out.strip().splitlines()
        assert nok == ["NOK: absent-entry-zz"]

    def test_insert_then_check(self, tmp_path, wordfile):
        out = str(tmp_path / "f.pop")
        main(["create", "-c", "6000", out, wordfile])
        extra = tmp_path / "extra.txt"
        extra.write_text("brand-new-entry\n")
        main(["insert", out, str(extra)])
        assert load(out).contains_bytes("brand-new-entry")

    def test_show(self, tmp_path, wordfile, capsys):
        out = str(tmp_path / "f.pop")
        main(["create", "-p", "0.02", "--version", "1", out, wordfile])
        main(["show", out])
        text = capsys.readouterr().out
        assert "version: 1" in text
        assert "capacity: 5000" in text
        assert "fpp: 0.02" in text

    def test_bench_gate_passes(self, wordfile, capsys):
        assert main(["bench", "-p", "0.001", "--runs", "1", wordfile]) == 0
        assert "avg fpr" in capsys.readouterr().out


class TestParallelCreate:
    def test_jobs_and_sharded_create_match_local(self, tmp_path):
        """create -j 4 (Spark) and -j 4 --shards 4 both produce the same
        bytes as the single-process create (modulo the count field, which
        the parallel paths re-estimate — compare params + membership)."""
        from poppy_spark.__main__ import main
        from poppy_spark.core import load

        data = tmp_path / "keys.txt"
        lines = [f"cli-key-{i:06d}" for i in range(5000)]
        data.write_text("\n".join(lines) + "\n")
        f_local = str(tmp_path / "local.pop")
        f_spark = str(tmp_path / "spark.pop")
        f_shard = str(tmp_path / "shard.pop")
        assert main(["create", "-p", "0.01", f_local, str(data)]) == 0
        assert main(["create", "-p", "0.01", "-j", "4", f_spark, str(data)]) == 0
        assert main(["create", "-p", "0.01", "-j", "4", "--shards", "4", f_shard, str(data)]) == 0
        # spark paths agree with each other byte-for-byte
        assert open(f_spark, "rb").read() == open(f_shard, "rb").read()
        a, b = load(f_local), load(f_spark)
        assert a.has_same_params(b)
        probe = [s.encode() for s in lines[:500]]
        assert all(b.contains_batch(probe))


def test_cli_profile(tmp_path, capsys):
    import json

    from poppy_spark.__main__ import main

    rc = main(["profile", "-j", "2", "--columns", "user_id",
               "/root/testdata/sf0.001/events.parquet"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(line)
    assert row["column"] == "user_id" and row["n_rows"] == 1000


def test_cli_clean(tmp_path, capsys):
    import json

    from poppy_spark.__main__ import main

    out = str(tmp_path / "cleaned")
    rc = main(["clean", "-j", "2", "--line-dedup",
               "/root/testdata/sf0.001/documents.parquet", out])
    assert rc == 0
    stat = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stat["rows_in"] == 500 and 0 < stat["rows_out"] <= 500


def test_cli_clean_normalize_gopher(spark, tmp_path, capsys):
    """Round-5 flags: --normalize NFC merges representation-variant
    duplicates before exact dedup; --gopher drops rule-failing docs."""
    import json

    from poppy_spark.__main__ import main

    good = (
        "the quick brown fox jumps over the lazy dog and then settles down "
        "to rest with a full belly of warm food that it found near the old "
        "barn where farmers have stored their grain for many years now and "
        "plan to keep doing so because the barn is dry and safe from rain"
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, good + " cafe\u0301"),      # decomposed
            (2, good + " caf\u00e9"),       # precomposed NFC-equal dup
            (3, "too short to survive the gopher word-count rule"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "cleaned")
    rc = main(["clean", "-j", "2", "--normalize", "NFC", "--gopher", src, out])
    assert rc == 0
    stat = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 2 merges into doc 1 post-NFC; doc 3 fails rule_words
    assert stat["rows_in"] == 3 and stat["rows_out"] == 1
    survivors = spark.read.parquet(out).collect()
    assert [r["doc_id"] for r in survivors] == [1]


def test_cli_spans(spark, tmp_path, capsys):
    """Round-4 `spans` subcommand: the planted shared tail surfaces as the
    heaviest repeated span, one JSON line per span."""
    import json

    from pyspark.sql import functions as F

    from poppy_spark.__main__ import main

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" subscribe to our newsletter for more updates")),
        ).otherwise(F.col("text")).alias("text"),
    )
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    rc = main([
        "spans", "-j", "2", "--span-words", "7", "--top", "5", "--show-text", path,
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(out) <= 5
    rows = [json.loads(x) for x in out]
    assert rows[0]["n_docs"] >= 100  # the planted tail dominates
    assert "subscribe to our newsletter" in rows[0]["span_text"]


def test_cli_standalone_subprocess(tmp_path):
    """The CLI must work in a FRESH process with no ambient SparkSession —
    an in-process test session short-circuits the ownership check and can
    mask breakage there (exactly how the round-4 getDefaultSession
    AttributeError slipped past the in-process tests)."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable, "-m", "poppy_spark", "spans", "-j", "2",
            "--span-words", "4", "--min-docs", "2", "--top", "2",
            "/root/testdata/sf0.001/documents.parquet",
        ],
        capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-500:]
    assert json.loads(lines[0])["n_docs"] >= 2
