"""Generic-table decode: full type breadth through the distributed path.

The typed fixture exercises every scalar-type family of
/root/reference/types.go:118-304 (ints all widths ± unsigned, decimal,
float/double, varchar, text, enum, set, datetime2, timestamp2, date,
time2 incl. negatives, year, bit) in one table; Spark's generic decode
must agree with the sequential oracle record-for-record."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.decoder.chunks import chunks_df
from binlog_spark.decoder.generic import decode_changes_generic, _image_json
from binlog_spark.mysql import oracle
from binlog_spark.mysql.gen_typed import generate_typed


@pytest.fixture(scope="module")
def typed_dump(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("typed"))
    live = generate_typed(d, n_changes=1500)
    return d, live


def test_generic_decode_matches_oracle(spark, typed_dump):
    d, _live = typed_dump
    got = {(r.gtid, r.seq_in_tx): r
           for r in decode_changes_generic(chunks_df(spark, d)).collect()}
    want = list(oracle.iter_change_records(d))
    assert len(got) == len(want)
    for w in want:
        g = got[(w.gtid, w.seq_in_tx)]
        assert g.op == w.op
        assert g.table_name == "typed_rows"
        assert g.after_json == _image_json(w.columns, w.after)
        assert g.before_json == _image_json(w.columns, w.before)


def test_generic_apply_by_key(spark, typed_dump):
    """Re-derive the final state from the Spark-decoded JSON images and
    compare against the generator's live set (count + id set)."""
    d, live = typed_dump
    state: dict[int, dict] = {}
    rows = (decode_changes_generic(chunks_df(spark, d))
            .orderBy("log_file", "log_pos", "seq_in_tx").collect())
    for r in rows:
        img = json.loads(r.after_json if r.op in ("I", "U") else r.before_json)
        if r.op in ("I", "U"):
            state[img["id"]] = img
        else:
            state.pop(img["id"], None)
    assert set(state) == set(live)
    # spot-check typed values render exactly (decimal string, enum label)
    some_id = next(iter(state))
    img = state[some_id]
    assert isinstance(img["amount"], str) and "." in img["amount"]
    assert set(img["kind"]) == {"idx", "label"}
    assert isinstance(img["bits"], int)


def test_generic_types_present(spark, typed_dump):
    d, _ = typed_dump
    row = (decode_changes_generic(chunks_df(spark, d))
           .filter("op = 'I'").first())
    img = json.loads(row.after_json)
    assert sorted(img) == sorted(
        ["id", "n_small", "big", "amount", "ratio", "frac", "flag", "name",
         "body", "kind", "tags", "created", "updated", "day", "dur", "yr",
         "bits", "doc"])
    # temporal renderings are ISO strings; negative TIME is an int (µs)
    assert "T" in img["created"]
    assert isinstance(img["dur"], int)
