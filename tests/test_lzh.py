"""The bundled pure-Python -lh5- decoder must reproduce the committed
txt corpus byte-for-byte (after CRLF normalization), and the
archive->lines bronze path must parse identically to the txt path."""

from __future__ import annotations

import pytest

from boatrace_database_spark.sources.bronze import (
    decompress_lzh_to_dir,
    read_lzh_txt_lines,
    read_txt_lines,
)
from boatrace_database_spark.sources.lzh import read_lzh


@pytest.mark.parametrize(
    "archive,txt",
    [
        ("K2020-08-01.lzh", "K200801.TXT"),
        ("B2020-08-01.lzh", "B200801.TXT"),
        ("K2020-08-12.lzh", "K200812.TXT"),
    ],
)
def test_lh5_decode_matches_committed_txt(archive, txt):
    members = read_lzh(f"/root/reference/lzh/{archive}")
    assert len(members) == 1 and members[0].method == "-lh5-"
    got = members[0].data.replace(b"\r\n", b"\n")
    golden = open(f"/root/reference/txt/{txt}", "rb").read()
    assert got == golden


def test_decompress_to_dir(tmp_path):
    out = decompress_lzh_to_dir(
        ["/root/reference/lzh/K2020-08-02.lzh"], str(tmp_path)
    )
    assert out == [str(tmp_path / "K200802.TXT")]
    golden = open("/root/reference/txt/K200802.TXT", "rb").read()
    assert open(out[0], "rb").read() == golden


def test_lzh_bronze_equals_txt_bronze(spark):
    via_lzh = read_lzh_txt_lines(spark, "/root/reference/lzh/K2020-08-01.lzh")
    via_txt = read_txt_lines(spark, "/root/reference/txt/K200801.TXT")
    a = sorted(tuple(r) for r in via_lzh.collect())
    b = sorted(tuple(r) for r in via_txt.collect())
    assert a == b
