"""Mixed-type table fixture: exercises the full scalar-type decode matrix
(/root/reference/types.go:118-304 breadth) through the *distributed* path,
not just the pure-Python one.

Table `lake.typed_rows` — one column per interesting MySQL type family:

    id INT, n_small SMALLINT UNSIGNED, big BIGINT, amount DECIMAL(12,4),
    ratio DOUBLE, frac FLOAT, flag TINYINT, name VARCHAR(40), body TEXT,
    kind ENUM(...), tags SET(...), created DATETIME(3), updated
    TIMESTAMP(0), day DATE, dur TIME(3), yr YEAR, bits BIT(12),
    doc JSON (generator-encoded binary JSON, r3)
"""

from __future__ import annotations

import datetime as dt
import os
import random
import uuid

from .. import constants as C
from . import encode as E
from .gen import BinlogWriter, GenConfig, SCHEMA

KINDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
TAGS = ["red", "green", "blue", "gold", "gray"]

TYPED_COLUMNS = [
    E.ColumnDef("id", C.TYPE_LONG, nullable=False),
    E.ColumnDef("n_small", C.TYPE_SHORT, unsigned=True),
    E.ColumnDef("big", C.TYPE_LONGLONG),
    E.ColumnDef("amount", C.TYPE_NEWDECIMAL, meta=12 | (4 << 8)),
    E.ColumnDef("ratio", C.TYPE_DOUBLE, meta=8),
    E.ColumnDef("frac", C.TYPE_FLOAT, meta=4),
    E.ColumnDef("flag", C.TYPE_TINY),
    E.varchar("name", 40),
    E.ColumnDef("body", C.TYPE_BLOB, meta=2, charset=C.CHARSET_UTF8MB4),
    E.ColumnDef("kind", C.TYPE_ENUM, meta=1, values=KINDS),
    E.ColumnDef("tags", C.TYPE_SET, meta=1, values=TAGS),
    E.ColumnDef("created", C.TYPE_DATETIME2, meta=3),
    E.ColumnDef("updated", C.TYPE_TIMESTAMP2, meta=0),
    E.ColumnDef("day", C.TYPE_DATE),
    E.ColumnDef("dur", C.TYPE_TIME2, meta=3),
    E.ColumnDef("yr", C.TYPE_YEAR),
    E.ColumnDef("bits", C.TYPE_BIT, meta=(1 << 8) | 4),  # 12 bits
    E.ColumnDef("doc", C.TYPE_JSON, meta=4),
]

TABLE = "typed_rows"


def _row(rnd: random.Random, rid: int) -> tuple:
    neg = rnd.random() < 0.3
    micros = ((rnd.randint(0, 800) * 3600 + rnd.randint(0, 59) * 60
               + rnd.randint(0, 59)) * 1_000_000 + rnd.randint(0, 999) * 1000)
    return (
        rid,
        rnd.randint(0, 65535),
        rnd.randint(-(2 ** 62), 2 ** 62),
        f"{rnd.randint(-99999999, 99999999)}.{rnd.randint(0, 9999):04d}",
        rnd.random() * 1e6,
        round(rnd.random(), 3),
        rnd.randint(-128, 127),
        f"name-{rid}-{rnd.randint(0, 999)}",
        "body " * rnd.randint(1, 30),
        rnd.randint(1, len(KINDS)),
        rnd.randint(0, (1 << len(TAGS)) - 1),
        dt.datetime(2020 + rnd.randint(0, 5), rnd.randint(1, 12),
                    rnd.randint(1, 28), rnd.randint(0, 23),
                    rnd.randint(0, 59), rnd.randint(0, 59),
                    rnd.randint(0, 999) * 1000),
        (rnd.randint(1, 2_000_000_000), 0),
        dt.date(1990 + rnd.randint(0, 40), rnd.randint(1, 12),
                rnd.randint(1, 28)),
        -micros if neg else micros,
        0 if rnd.random() < 0.05 else 1901 + rnd.randint(0, 254),
        rnd.getrandbits(12),
        _doc(rnd, rid),
    )


def _doc(rnd: random.Random, rid: int) -> bytes:
    """A small random JSON document, ENCODED to MySQL binary JSON by the
    generator-side encoder (jsonb.encode_jsonb — the server's role); the
    decoders render it back to compact JSON text."""
    from .jsonb import encode_jsonb
    doc = {
        "id": rid,
        "tags": [rnd.choice(KINDS) for _ in range(rnd.randint(0, 3))],
        "score": round(rnd.random() * 100, 3),
        "meta": {"active": rnd.random() < 0.5,
                 "note": None if rnd.random() < 0.3
                 else f"n-{rnd.randrange(100)}"},
        "big": rnd.randint(-(1 << 40), 1 << 40),
    }
    return encode_jsonb(doc)


def generate_typed(out_dir: str, n_changes: int = 2000, seed: int = 7) -> dict:
    """Emit a binlog dump of INSERT/UPDATE/DELETE against the typed table.
    Returns {id: row-tuple} of the expected final state (values as the
    decoder should render them is the oracle's job)."""
    rnd = random.Random(seed)
    cfg = GenConfig(n_changes=n_changes, seed=seed, max_file_bytes=8 << 20)
    w = BinlogWriter(out_dir, cfg, chunk_target=256 * 1024)
    w._open_file()
    sid = uuid.UUID(int=rnd.getrandbits(128)).bytes
    live: dict[int, tuple] = {}
    gno = 0
    next_id = 0
    batch: list[tuple[int, list, list | None]] = []
    for i in range(n_changes):
        r = rnd.random()
        if not live or r < 0.5:
            next_id += 1
            row = _row(rnd, next_id)
            live[next_id] = row
            batch.append((C.WRITE_ROWS_EVENTv2, [row], None))
        elif r < 0.8:
            rid = rnd.choice(list(live))
            old = live[rid]
            row = _row(rnd, rid)
            live[rid] = row
            batch.append((C.UPDATE_ROWS_EVENTv2, [row], [old]))
        else:
            rid = rnd.choice(list(live))
            batch.append((C.DELETE_ROWS_EVENTv2, [live.pop(rid)], None))
        if len(batch) >= 8:
            gno += 1
            w.write_transaction(sid, gno, batch, TYPED_COLUMNS,
                                table_id=200, table=TABLE)
            batch = []
    if batch:
        gno += 1
        w.write_transaction(sid, gno, batch, TYPED_COLUMNS, table_id=200, table=TABLE)
    w._emit(C.ROTATE_EVENT, E.rotate_body(f"binlog.{w.file_no + 1:06d}", 4))
    w.close()
    import json
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"files": w.manifest.files, "chunks": w.manifest.chunks,
                   "n_changes": n_changes,
                   "n_transactions": w.manifest.n_transactions}, f)
    write_typed_golden(out_dir)
    return live


def write_typed_golden(out_dir: str) -> None:
    """Sequential-oracle golden for the distributed typed decode: a single-
    threaded whole-file pass (decode.decode_chunk in .next order) rendered
    to the same JSON images, as parquet.  Checks the *distributed* plumbing
    — chunk splitting, TABLE_MAP cache locality, mapInArrow batching,
    ordering — against the sequential read; value-level decode correctness
    is covered separately by tests/test_types_matrix.py's constant
    expectations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..decoder.generic import _image_json
    from .oracle import iter_change_records

    names = ("op", "table_schema", "table_name", "before_json",
             "after_json", "gtid", "seq_in_tx", "log_file", "log_pos",
             "ts_sec", "crc_ok")
    cols: dict[str, list] = {k: [] for k in names}
    for r in iter_change_records(out_dir):
        cols["op"].append(r.op)
        cols["table_schema"].append(r.table_schema)
        cols["table_name"].append(r.table_name)
        cols["before_json"].append(_image_json(r.columns, r.before))
        cols["after_json"].append(_image_json(r.columns, r.after))
        cols["gtid"].append(r.gtid)
        cols["seq_in_tx"].append(r.seq_in_tx)
        cols["log_file"].append(r.log_file)
        cols["log_pos"].append(r.log_pos)
        cols["ts_sec"].append(r.ts)
        cols["crc_ok"].append(r.crc_ok)
    typ = {"seq_in_tx": pa.int32(), "log_pos": pa.int64(),
           "ts_sec": pa.int64(), "crc_ok": pa.bool_()}
    tbl = pa.table({k: pa.array(v, typ.get(k, pa.string()))
                    for k, v in cols.items()})
    pq.write_table(tbl, os.path.join(out_dir, "golden_typed.parquet"))
