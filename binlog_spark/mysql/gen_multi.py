"""Multi-table fixture: one binlog stream interleaving several tables.

Exercises the demultiplexing path of cdc.multi.replay_generic — the
reference decodes any table a TABLE_MAP announces
(/root/reference/rbr.go:18-24); this fixture emits transactions against
three tables with distinct schemas and PRIMARY KEYs (single-column INT,
composite, and VARCHAR), including key-moving updates and deletes.

Deterministic under (seed, n_changes); the companion ``apply_multi``
oracle replays the same dump single-threaded per table.
"""

from __future__ import annotations

import json
import random

from .. import constants as C
from . import encode as E
from .gen import BinlogWriter, GenConfig
from .oracle import iter_change_records

DB = "inventory"

#: table -> (columns, pk ordinals)
TABLES: dict[str, tuple[list, tuple[int, ...]]] = {
    "users": ([
        E.ColumnDef("id", C.TYPE_LONG, nullable=False),
        E.varchar("name", 40, nullable=False),
        E.varchar("email", 80),
    ], (0,)),
    "order_lines": ([
        E.ColumnDef("order_id", C.TYPE_LONG, nullable=False),
        E.ColumnDef("line_no", C.TYPE_SHORT, nullable=False),
        E.varchar("item", 40, nullable=False),
        E.ColumnDef("qty", C.TYPE_LONG),
    ], (0, 1)),
    "settings": ([
        E.varchar("key", 60, nullable=False),
        E.varchar("value", 200),
    ], (0,)),
}

_TABLE_IDS = {name: 300 + i for i, name in enumerate(TABLES)}


def _new_row(rnd: random.Random, table: str, uid: int) -> tuple:
    if table == "users":
        return (uid, f"user-{uid}", f"u{uid}@example.com")
    if table == "order_lines":
        return (uid // 4, uid % 4, f"item-{rnd.randrange(50)}",
                rnd.randrange(1, 9))
    return (f"key-{uid}", f"value-{rnd.randrange(1000)}")


def _mutate(rnd: random.Random, table: str, row: tuple) -> tuple:
    """Non-key mutation."""
    if table == "users":
        return (row[0], row[1], f"u{row[0]}+{rnd.randrange(100)}@example.com")
    if table == "order_lines":
        return (*row[:3], rnd.randrange(1, 99))
    return (row[0], f"value-{rnd.randrange(1000)}")


def _move_key(table: str, row: tuple, uid: int) -> tuple:
    """Key-changing mutation (forces an old-key tombstone downstream)."""
    if table == "users":
        return (uid, *row[1:])
    if table == "order_lines":
        return (uid // 4, uid % 4, *row[2:])
    return (f"key-{uid}", *row[1:])


def generate_multi(out_dir: str, n_changes: int = 3000,
                   seed: int = 11, minimal_images: bool = False) -> dict:
    """``minimal_images``: emit binlog_row_image=MINIMAL events — UPDATE
    before-images carry the pk only and after-images only the CHANGED
    columns (a key move whose payload didn't change carries just the new
    key cells); DELETEs carry pk-only WHERE images.  Matches the subsets
    /root/reference/rbr.go:283-303 surfaces."""
    rnd = random.Random(seed)
    cfg = GenConfig(n_changes=n_changes)
    w = BinlogWriter(out_dir, cfg, chunk_target=64 << 10,
                     record_events=n_changes <= 500_000)
    w._open_file()
    sid = bytes(range(16))
    live: dict[str, dict[tuple, tuple]] = {t: {} for t in TABLES}
    # persistent per-table key lists with swap-pop removal — rebuilding
    # (or .remove()-ing) a list per transaction is O(live set) and made
    # million-change fixtures quadratic
    keys_of: dict[str, list[tuple]] = {t: [] for t in TABLES}
    table_names = list(TABLES)
    uid = 0
    gno = 0
    emitted = 0
    while emitted < n_changes:
        gno += 1
        table = rnd.choice(table_names)
        cols, pk = TABLES[table]
        keys = keys_of[table]
        stmts = []
        for _ in range(rnd.randrange(1, 4)):
            if emitted >= n_changes:
                break
            ncol = len(cols)
            pk_bits = tuple(i in pk for i in range(ncol))

            roll = rnd.random()
            if not keys or roll < 0.5:
                uid += 1
                row = _new_row(rnd, table, uid)
                k = tuple(row[i] for i in pk)
                if k in live[table]:
                    continue
                live[table][k] = row
                keys.append(k)
                stmts.append((C.WRITE_ROWS_EVENTv2, [row], None))
            elif roll < 0.8:
                i = rnd.randrange(len(keys))
                k = keys[i]
                before = live[table][k]
                if rnd.random() < 0.15:  # key move
                    uid += 1
                    after = _move_key(table, before, uid)
                    nk = tuple(after[i2] for i2 in pk)
                    if nk in live[table]:
                        continue
                    del live[table][k]
                    live[table][nk] = after
                    keys[i] = nk
                else:
                    after = _mutate(rnd, table, before)
                    live[table][k] = after
                if minimal_images:
                    changed = tuple(before[j] != after[j]
                                    for j in range(ncol))
                    stmts.append((
                        C.UPDATE_ROWS_EVENTv2,
                        [[v for v, c in zip(after, changed) if c]],
                        [[before[j] for j in pk]],
                        changed, pk_bits))
                else:
                    stmts.append((C.UPDATE_ROWS_EVENTv2, [after], [before]))
            else:
                i = rnd.randrange(len(keys))
                k = keys[i]
                keys[i] = keys[-1]
                keys.pop()
                before = live[table].pop(k)
                if minimal_images:
                    stmts.append((C.DELETE_ROWS_EVENTv2,
                                  [[before[j] for j in pk]], None, pk_bits))
                else:
                    stmts.append((C.DELETE_ROWS_EVENTv2, [before], None))
            emitted += 1
        if stmts:
            w.write_transaction(sid, gno, stmts, cols, schema=DB,
                                table_id=_TABLE_IDS[table], table=table,
                                pk=pk)
    w.close()
    man = {"n_changes": emitted, "n_transactions": w.manifest.n_transactions,
           "files": w.manifest.files,
           "chunks": [list(c) for c in w.manifest.chunks]}
    import os
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    write_multi_golden(out_dir, live)
    return man


def write_multi_golden(out_dir: str,
                       live: dict[str, dict[tuple, tuple]]) -> None:
    """Generator-side truth for the multi-table replay: the script's own
    live state per table, rendered exactly as binlog_demo.binlog_multi_table
    renders the lake tables — pk_json/row_json are compact JSON objects in
    lake schema order (pk columns first), nulls omitted (matching Spark's
    ``to_json(struct(...))``)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = {"table_schema": [], "table_name": [], "pk_json": [],
           "row_json": []}
    for table in sorted(TABLES):
        cols, pk = TABLES[table]
        names = [c.name for c in cols]
        pk_names = [names[i] for i in pk]
        order = pk_names + [n for n in names if n not in pk_names]
        for row in live[table].values():
            vals = dict(zip(names, (render(v) for v in row)))
            out["table_schema"].append(DB)
            out["table_name"].append(table)
            out["pk_json"].append(json.dumps(
                {p: vals[p] for p in pk_names}, separators=(",", ":")))
            out["row_json"].append(json.dumps(
                {c: vals[c] for c in order if vals[c] is not None},
                separators=(",", ":")))
    pq.write_table(pa.table({k: pa.array(v, pa.string())
                             for k, v in out.items()}),
                   os.path.join(out_dir, "golden_multi.parquet"))


def render(v):
    """A decoded value as the TYPED lake surface exposes it: ints and
    strings pass through (cdc.multi.spark_type_for maps the fixture's
    INT/SMALLINT/VARCHAR columns to int/long/string); anything exotic
    falls back to its JSON rendering."""
    if v is None or isinstance(v, (str, int)):
        return v
    return json.dumps(v)


def apply_multi(dump_dir: str) -> dict[tuple, dict[tuple, dict]]:
    """Sequential oracle: {(schema, table): {pk_values: {col: str}}}.

    Keys each table by the pk NAMES parsed from its TABLE_MAP (TLV 8) —
    independently of the generator's table definitions."""
    pk_names = {t: tuple(TABLES[t][0][i].name for i in TABLES[t][1])
                for t in TABLES}
    all_names = {t: [c.name for c in TABLES[t][0]] for t in TABLES}
    state: dict[tuple, dict[tuple, dict]] = {}
    for r in iter_change_records(dump_dir):
        cols = list(r.columns)
        pks = pk_names[r.table_name]
        tkey = (r.table_schema, r.table_name)
        tbl = state.setdefault(tkey, {})

        if r.op == "I":
            tbl[tuple(render(r.after[cols.index(p)]) for p in pks)] = \
                dict(zip(cols, map(render, r.after)))
        elif r.op == "D":
            # MINIMAL delete: r.columns names the pk-only WHERE image
            tbl.pop(tuple(render(r.before[cols.index(p)]) for p in pks),
                    None)
        else:
            bnames = list(r.before_columns) or cols
            brow = dict(zip(bnames, map(render, r.before)))
            arow = dict(zip(cols, map(render, r.after)))
            bk = tuple(brow[p] for p in pks)
            if r.partial:
                # partial after-image PATCHES the row at the before-key;
                # unchanged columns (incl. an unmoved pk) inherit
                base = dict(tbl.get(bk) or brow)
                base.update(arow)
                arow = {c: base.get(c) for c in all_names[r.table_name]}
            ak = tuple(arow[p] for p in pks)
            if bk != ak:
                tbl.pop(bk, None)
            tbl[ak] = arow
    return state
