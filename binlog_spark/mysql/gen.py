"""Deterministic binlog fixture generator.

Plays the role of the MySQL server in the reference's round-trip tests
(/root/reference/types_test.go:284-354): given a seeded change script over
the ``(repo, path, commit, lang, content)`` table, emits a directory of
valid binlog v4 files chained exactly like the reference's dump directory
(``.next`` pointer files, /root/reference/local.go:35-73), plus a chunk
manifest whose chunk boundaries are aligned to transaction boundaries.

Event sequence per transaction (mirrors RBR logging):
    GTID -> QUERY(BEGIN) -> [TABLE_MAP -> ROWS_EVENT]... -> XID
with FORMAT_DESCRIPTION at each file start and ROTATE at each file end.
"""

from __future__ import annotations

import hashlib
import os
import random
import struct
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterator, Sequence

from .. import constants as C
from . import encode as E

SCHEMA = "lake"
TABLE = "repo_files"

LANGS = ["py", "go", "rs", "js", "ts", "java", "c", "cpp", "rb", "sh",
         "sql", "md", "yaml", "toml", "html", "css", "scala", "kt", "swift", "php"]
EXT2LANG = {l: l for l in LANGS}

_WORDS = ("fn def class import return if else for while match struct enum "
          "let const var async await spawn select join map filter reduce "
          "table row column index commit merge apply delta state offset").split()


@dataclass
class Change:
    """One row-change in the script: op in {I, U, D}."""
    op: str
    repo: str
    path: str
    commit: str | None = None
    lang: str | None = None
    content: str | None = None
    branch: str | None = None       # present only after schema evolution
    # set on key-moving UPDATEs: the before-image lives at this (old) key
    before_repo: str | None = None
    before_path: str | None = None


@dataclass
class GenConfig:
    n_changes: int = 10_000
    n_repos: int = 50
    seed: int = 42
    rows_per_event: int = 64
    events_per_tx: int = 4          # rows-events per transaction
    max_file_bytes: int = 4 << 20   # rotate when file exceeds this
    server_id: int = 1
    zipf_a: float = 1.3             # repo popularity skew
    content_min: int = 10
    content_max: int = 4096
    base_ts: int = 1_700_000_000
    #: binlog_checksum: False emits a CRC-less dump (alg byte 0, no
    #: event trailers) — exercises the FDE-less chunk checksum probe
    checksum: bool = True
    #: change index at which the table gains a `branch` column (ALTER TABLE
    #: mid-stream -> subsequent TABLE_MAPs carry 6 columns; the engine's
    #: schema-evolution trigger, SURVEY §1.2).  None = no evolution.
    evolve_at: int | None = None
    #: fraction of UPDATEs aimed at ONE designated hot key — pathological
    #: single-key skew (SURVEY §7 hard-parts #5).  0 = natural Zipf only.
    hot_key_ratio: float = 0.0
    #: fraction of UPDATEs that MOVE the row's primary key (file rename):
    #: before-image at the old (repo, path), after-image at a new one —
    #: the case that forces an old-key tombstone downstream
    #: (/root/reference/rbr.go:344-349 surfaces both images for exactly
    #: this reason).
    key_move_ratio: float = 0.05
    #: emit the statement-event variety a real replication stream carries
    #: (ROWS_QUERY per some transactions, INTVAR/RAND/USER_VAR session
    #: state, rare INCIDENT, DDL QUERY at the ALTER boundary)
    stmt_events: bool = True
    #: binlog_row_image=MINIMAL: UPDATEs carry PK-only before-images and
    #: PK+changed after-images; DELETEs carry PK-only WHERE images
    #: (/root/reference/rbr.go:283-303 reads the columns-present subsets)
    minimal_images: bool = False
    #: fraction of new keys (INSERT targets and key-move destinations)
    #: drawn from previously-vacated keys instead of fresh ones — MySQL
    #: reuses deleted PKs freely, so a key's history can interleave dead
    #: row generations with the history of the row that finally lives
    #: there (I(X)…D(X)…U moving O→X).  0 = never reuse (legacy fixtures
    #: stay byte-identical).
    key_reuse_ratio: float = 0.0


class ChangeScript:
    """Seeded generator of a change script with Zipf-skewed repo popularity.

    Maintains live-key state so UPDATE/DELETE always reference existing
    (repo, path) keys — the invariant MySQL RBR guarantees (a before-image
    always matches a live row).
    """

    def __init__(self, cfg: GenConfig) -> None:
        self.cfg = cfg
        self.rnd = random.Random(cfg.seed)
        # live rows: (commit, lang, content, branch-or-None)
        self.live: dict[tuple[str, str], tuple] = {}
        self.live_keys: list[tuple[str, str]] = []
        # keys vacated by DELETE or a key-moving UPDATE — candidates for
        # reuse (key_reuse_ratio)
        self.dead_keys: list[tuple[str, str]] = []
        self.n_emitted = 0
        self._commit_no = 0
        # precompute Zipf repo weights
        self.repos = [f"org{i % 7}/repo{i}" for i in range(cfg.n_repos)]
        self.weights = [1.0 / (i + 1) ** cfg.zipf_a for i in range(cfg.n_repos)]

    _AVG_WORD = sum(len(w) + 1 for w in _WORDS) / len(_WORDS)

    def _content(self) -> str:
        n = self.rnd.randint(self.cfg.content_min, self.cfg.content_max)
        k = max(1, int(n / self._AVG_WORD))
        return " ".join(self.rnd.choices(_WORDS, k=k))

    def _commit(self) -> str:
        self._commit_no += 1
        return hashlib.sha1(
            f"c{self.cfg.seed}:{self._commit_no}".encode()).hexdigest()

    def _new_key(self) -> tuple[str, str]:
        # reuse a vacated key sometimes (MySQL PKs are reusable; the
        # extra rnd draw happens only when the ratio is on, so legacy
        # fixtures keep their exact byte streams)
        if (self.cfg.key_reuse_ratio > 0 and self.dead_keys
                and self.rnd.random() < self.cfg.key_reuse_ratio):
            i = self.rnd.randrange(len(self.dead_keys))
            key = self.dead_keys[i]
            self.dead_keys[i] = self.dead_keys[-1]
            self.dead_keys.pop()
            if key not in self.live:
                return key
        repo = self.rnd.choices(self.repos, weights=self.weights)[0]
        depth = self.rnd.randint(1, 5)
        lang = self.rnd.choice(LANGS)
        parts = [self.rnd.choice(_WORDS) for _ in range(depth)]
        path = "/".join(parts) + f"_{self.rnd.randint(0, 10**6)}.{lang}"
        return repo, path

    @property
    def evolved(self) -> bool:
        ev = self.cfg.evolve_at
        return ev is not None and self.n_emitted >= ev

    def _branch(self) -> str | None:
        return f"b{self.rnd.randint(0, 3)}" if self.evolved else None

    def __iter__(self) -> Iterator[Change]:
        for _ in range(self.cfg.n_changes):
            r = self.rnd.random()
            if not self.live_keys or r < 0.55:
                repo, path = self._new_key()
                while (repo, path) in self.live:
                    repo, path = self._new_key()
                lang = EXT2LANG.get(path.rsplit(".", 1)[-1])
                row = (self._commit(), lang, self._content(), self._branch())
                self.live[(repo, path)] = row
                self.live_keys.append((repo, path))
                yield Change("I", repo, path, *row)
            elif r < 0.85:
                hot = (self.cfg.hot_key_ratio > 0
                       and self.rnd.random() < self.cfg.hot_key_ratio)
                if hot:
                    i = 0  # the designated hot key
                else:
                    i = self.rnd.randrange(len(self.live_keys))
                repo, path = self.live_keys[i]
                old = self.live[(repo, path)]
                if (not hot and self.cfg.key_move_ratio > 0
                        and self.rnd.random() < self.cfg.key_move_ratio):
                    # key-moving UPDATE (file rename): vacate the old key
                    new_repo, new_path = self._new_key()
                    while (new_repo, new_path) in self.live:
                        new_repo, new_path = self._new_key()
                    del self.live[(repo, path)]
                    self.live_keys[i] = self.live_keys[-1]
                    self.live_keys.pop()
                    self.dead_keys.append((repo, path))
                    lang = EXT2LANG.get(new_path.rsplit(".", 1)[-1])
                    row = (self._commit(), lang, self._content(),
                           self._branch())
                    self.live[(new_repo, new_path)] = row
                    self.live_keys.append((new_repo, new_path))
                    yield Change("U", new_repo, new_path, *row,
                                 before_repo=repo, before_path=path)
                else:
                    row = (self._commit(), old[1], self._content(),
                           self._branch())
                    self.live[(repo, path)] = row
                    yield Change("U", repo, path, *row)
            else:
                i = self.rnd.randrange(len(self.live_keys))
                repo, path = self.live_keys[i]
                self.live_keys[i] = self.live_keys[-1]
                self.live_keys.pop()
                del self.live[(repo, path)]
                self.dead_keys.append((repo, path))
                yield Change("D", repo, path)
            self.n_emitted += 1

    def final_state(self) -> dict[tuple[str, str], tuple]:
        return dict(self.live)


class StaticScript:
    """A hand-written change sequence with the same surface ChangeScript
    exposes to ``generate`` — for targeted fixtures (key reuse, move
    chains) whose exact interleaving a seeded random script can't pin."""

    def __init__(self, changes: Sequence[Change]) -> None:
        self.changes = list(changes)
        self.live: dict[tuple[str, str], tuple] = {}
        self.evolved = False

    def __iter__(self) -> Iterator[Change]:
        for ch in self.changes:
            key = (ch.repo, ch.path)
            if ch.op == "I":
                self.live[key] = (ch.commit, ch.lang, ch.content)
            elif ch.op == "U":
                bkey = ((ch.before_repo, ch.before_path)
                        if ch.before_repo is not None else key)
                self.live.pop(bkey, None)
                self.live[key] = (ch.commit, ch.lang, ch.content)
            else:
                self.live.pop(key, None)
            yield ch

    def final_state(self) -> dict[tuple[str, str], tuple]:
        return dict(self.live)


@dataclass
class Manifest:
    """Generator output: ordered files + transaction-aligned chunk spans."""
    files: list[str] = field(default_factory=list)
    # (log_file, chunk_off, chunk_len)
    chunks: list[tuple[str, int, int]] = field(default_factory=list)
    n_changes: int = 0
    n_transactions: int = 0
    # every framed event (FDE/ROTATE/GTID/QUERY/TABLE_MAP/ROWS/XID/...):
    # the work-proportional denominator for decode throughput (a fixture
    # with more statement frames per change is more work per change)
    n_frames: int = 0
    # largest row count in any one transaction: > 32767 means the packed
    # BIGINT order key's seq clamp could mis-tie-break and replay should
    # auto-enable the wide DECIMAL order (cdc.pipeline.pack_ord wide=True)
    max_tx_rows: int = 0


class BinlogWriter:
    """Streams framed events into rotated files under ``out_dir``.

    File chaining mirrors the reference's dump dir: a ``.next`` file points
    at the first binlog, ``<file>.next`` at its successor
    (/root/reference/local.go:35-73).
    """

    def __init__(self, out_dir: str, cfg: GenConfig,
                 chunk_target: int = 1 << 20,
                 record_events: bool = False) -> None:
        self.dir = out_dir
        self.cfg = cfg
        self.chunk_target = chunk_target
        self.manifest = Manifest()
        self.file_no = 0
        self.fh = None
        self.pos = 0
        self.ts = cfg.base_ts
        self._chunk_start = 0
        #: generator-side truth for the golden-parquet oracles: one entry
        #: per rows-event — (log_file, log_pos, ts, gtid, ev_type, rows,
        #: before_rows).  log_pos is the event's next_pos, exactly what the
        #: decoder reports (decoder.kernel uses fr.next_pos).
        self.record_events = record_events
        self.events_log: list[tuple] = []
        #: statement-event emission log: (log_file, log_pos, ts, gtid,
        #: stmt_type, schema, text, value, n1, n2)
        self.statements_log: list[tuple] = []
        os.makedirs(out_dir, exist_ok=True)

    def emit_statement(self, event_type: int, body: bytes, gtid: str | None,
                       record: tuple) -> None:
        """Emit a statement event and log the generator-side truth.
        record = (stmt_type, schema, text, value, n1, n2)."""
        self._emit(event_type, body)
        if self.record_events:
            self.statements_log.append(
                (self.cur_name, self.pos, self.ts, gtid, *record))

    @property
    def cur_name(self) -> str:
        return f"binlog.{self.file_no:06d}"

    def _open_file(self) -> None:
        self.file_no += 1
        name = self.cur_name
        prev = self.manifest.files[-1] if self.manifest.files else None
        self.manifest.files.append(name)
        self.fh = open(os.path.join(self.dir, name), "wb")
        self.fh.write(C.MAGIC)
        self.pos = 4
        self._chunk_start = 4
        # .next chain
        ptr = os.path.join(self.dir, ".next" if prev is None else prev + ".next")
        with open(ptr, "w") as f:
            f.write(name)
        self._emit(C.FORMAT_DESCRIPTION_EVENT,
                   E.fde_body(checksum=self.cfg.checksum))

    def _emit(self, event_type: int, body: bytes, flags: int = 0) -> None:
        cklen = C.CHECKSUM_LEN if self.cfg.checksum else 0
        size = C.HEADER_SIZE + len(body) + cklen
        ev = E.frame_event(event_type, body, timestamp=self.ts,
                           server_id=self.cfg.server_id,
                           next_pos=self.pos + size, flags=flags,
                           with_checksum=self.cfg.checksum)
        self.fh.write(ev)
        self.pos += size
        self.manifest.n_frames += 1

    def _cut_chunk(self) -> None:
        if self.pos > self._chunk_start:
            self.manifest.chunks.append(
                (self.cur_name, self._chunk_start, self.pos - self._chunk_start))
            self._chunk_start = self.pos

    def _maybe_rotate(self) -> None:
        if self.pos >= self.cfg.max_file_bytes:
            nxt = f"binlog.{self.file_no + 1:06d}"
            self._emit(C.ROTATE_EVENT, E.rotate_body(nxt, 4))
            self._cut_chunk()
            self.fh.close()
            self._open_file()

    def write_transaction(self, sid: bytes, gno: int,
                          stmts: Sequence[tuple[int, Sequence[Sequence[Any]],
                                                Sequence[Sequence[Any]] | None]],
                          columns: Sequence[E.ColumnDef],
                          table_id: int = 100,
                          table: str = TABLE,
                          schema: str = SCHEMA,
                          pk: Sequence[int] = (),
                          extras: Sequence[tuple] = ()) -> None:
        """stmts: (rows_event_type, rows, before_rows[, present,
        before_present]) tuples — the optional bitmaps mark MINIMAL
        partial images.  extras: statement events emitted inside the
        transaction, each a (event_type, body, record) triple for
        emit_statement."""
        self.ts += 1
        self._emit(C.GTID_EVENT, E.gtid_body(sid, gno))
        gtid = f"{uuid.UUID(bytes=sid)}:{gno}" if self.record_events else None
        self.emit_statement(C.QUERY_EVENT, E.query_body(schema, "BEGIN"),
                            gtid, ("QUERY", schema, "BEGIN", None, None, None))
        for ev_type, body, record in extras:
            self.emit_statement(ev_type, body, gtid, record)
        for stmt in stmts:
            ev_type, rows, before = stmt[0], stmt[1], stmt[2]
            present = stmt[3] if len(stmt) > 3 else None
            before_present = stmt[4] if len(stmt) > 4 else None
            self._emit(C.TABLE_MAP_EVENT,
                       E.table_map_body(table_id, schema, table, columns,
                                        pk=pk))
            self._emit(ev_type, E.rows_body(ev_type, table_id, columns,
                                            rows, before, present=present,
                                            before_present=before_present))
            if self.record_events:
                self.events_log.append((self.cur_name, self.pos, self.ts,
                                        gtid, ev_type, rows, before))
        self._emit(C.XID_EVENT, E.xid_body(gno))
        self.manifest.n_transactions += 1
        self.manifest.max_tx_rows = max(
            self.manifest.max_tx_rows,
            sum(len(stmt[1]) for stmt in stmts))
        # chunk cut at transaction boundary once target size reached
        if self.pos - self._chunk_start >= self.chunk_target:
            self._cut_chunk()
        self._maybe_rotate()

    def close(self) -> None:
        self._cut_chunk()
        if self.fh:
            self.fh.close()


def _row(ch: Change, evolved: bool) -> tuple:
    base = (ch.repo, ch.path, ch.commit, ch.lang, ch.content)
    return base + (ch.branch,) if evolved else base


def _pad(row: tuple, ncol: int) -> tuple:
    """Rows written before an ALTER TABLE logically gain the new column
    with NULL — before-images must match the current schema."""
    return row + (None,) * (ncol - len(row))


def generate(out_dir: str, cfg: GenConfig | None = None,
             chunk_target: int = 1 << 20,
             script: "ChangeScript | StaticScript | None" = None) -> Manifest:
    """Generate a binlog dump dir + manifest from a seeded change script.

    Groups the script into transactions of ``events_per_tx`` rows-events of
    up to ``rows_per_event`` rows each, UPDATEs carrying before-images from
    the live state (so the stream is a faithful RBR log).

    ``script``: override the seeded ChangeScript with an explicit change
    sequence (StaticScript) — targeted edge-case fixtures.
    """
    cfg = cfg or GenConfig()
    script = script if script is not None else ChangeScript(cfg)
    rnd = random.Random(cfg.seed + 1)
    sid = uuid.UUID(int=rnd.getrandbits(128)).bytes
    # golden-parquet oracles are recorded for every fixture a correctness
    # gate might read; skipped above 500k changes (bench-scale inputs are
    # replicated span lists, not bigger scripts)
    w = BinlogWriter(out_dir, cfg, chunk_target,
                     record_events=(cfg.n_changes <= 500_000
                                    and not cfg.minimal_images))
    w._open_file()

    from .encode import varchar
    cols = list(E.REPO_FILES_COLUMNS)
    evolved_cols = cols + [varchar("branch", 16, nullable=True)]
    evolved = False
    gno = 0
    stmts: list[tuple[int, list, list | None]] = []
    # current same-op run, flushed into one rows-event on op switch or when
    # full — preserves script order within a transaction (MySQL groups
    # consecutive same-statement rows into one event the same way).
    cur_op: str | None = None
    rows: list = []
    before_rows: list = []
    #: per-event columns-present bitmaps (None = FULL image); rows within
    #: one event share them, like MySQL's statement-level bitmaps
    cur_present: tuple | None = None
    cur_bpresent: tuple | None = None
    before_state: dict[tuple[str, str], tuple] = {}
    _EV = {"I": C.WRITE_ROWS_EVENTv2, "U": C.UPDATE_ROWS_EVENTv2,
           "D": C.DELETE_ROWS_EVENTv2}
    n_ev = 0

    def flush_event() -> None:
        nonlocal cur_op, rows, before_rows, n_ev, cur_present, cur_bpresent
        if cur_op is None or not rows:
            return
        stmts.append((_EV[cur_op], rows,
                      before_rows if cur_op == "U" else None,
                      cur_present, cur_bpresent))
        rows, before_rows = [], []
        cur_op = None
        cur_present = cur_bpresent = None
        n_ev += 1

    rnd_stmt = random.Random(cfg.seed + 2)

    def tx_extras(gno: int) -> list[tuple]:
        """Statement events a real stream interleaves inside transactions
        (/root/reference/events.go:211-338, rbr.go:373-386)."""
        ex: list[tuple] = []
        if not cfg.stmt_events:
            return ex
        if rnd_stmt.random() < 0.3:
            q = f"UPDATE `{SCHEMA}`.`{TABLE}` /* tx {gno} */"
            ex.append((C.ROWS_QUERY_EVENT, E.rows_query_body(q),
                       ("ROWS_QUERY", None, q, None, None, None)))
        if rnd_stmt.random() < 0.08:
            v = rnd_stmt.randrange(1, 1 << 40)
            ex.append((C.INTVAR_EVENT, E.intvar_body(2, v),
                       ("INTVAR", None, None, None, 2, v)))
        if rnd_stmt.random() < 0.04:
            s1, s2 = (rnd_stmt.randrange(1 << 30),
                      rnd_stmt.randrange(1 << 30))
            ex.append((C.RAND_EVENT, E.rand_body(s1, s2),
                       ("RAND", None, None, None, s1, s2)))
        if rnd_stmt.random() < 0.04:
            # the full value-type matrix a real server logs: NULL, STRING,
            # signed/unsigned INT, REAL, DECIMAL
            # (/root/reference/events.go:306-338 dispatches on the type)
            name = f"v{rnd_stmt.randrange(10)}"
            roll = rnd_stmt.random()
            unsigned = False
            if roll < 0.15:
                val, expect = None, None
            elif roll < 0.4:
                val = f"val-{rnd_stmt.randrange(1000)}"
                expect = val
            elif roll < 0.6:
                val = rnd_stmt.randrange(-(1 << 40), 1 << 40)
                expect = str(val)
            elif roll < 0.7:
                val = (1 << 63) + rnd_stmt.randrange(1 << 40)
                unsigned = True
                expect = str(val)
            elif roll < 0.85:
                val = round(rnd_stmt.uniform(-1e6, 1e6), 6)
                expect = repr(val)
            else:
                sign = "-" if rnd_stmt.random() < 0.5 else ""
                text = (f"{sign}{rnd_stmt.randrange(10**8)}"
                        f".{rnd_stmt.randrange(10**4):04d}")
                val = ("decimal", text, 12, 4)
                expect = text
            ex.append((C.USER_VAR_EVENT,
                       E.user_var_body(name, val, unsigned=unsigned),
                       ("USER_VAR", None, name, expect, None, None)))
        return ex

    def flush_tx() -> None:
        nonlocal gno, stmts, n_ev
        flush_event()
        if stmts:
            gno += 1
            w.write_transaction(sid, gno, stmts, cols,
                                extras=tx_extras(gno))
            if cfg.stmt_events and rnd_stmt.random() < 0.004:
                msg = f"incident after tx {gno}"
                w.emit_statement(C.INCIDENT_EVENT, E.incident_body(1, msg),
                                 None, ("INCIDENT", None, msg, None, 1, None))
            stmts = []
        n_ev = 0

    for ch in script:
        key = (ch.repo, ch.path)
        if not evolved and script.evolved:
            # ALTER TABLE boundary: close the open transaction under the
            # old schema; subsequent TABLE_MAPs declare the new column.
            # The DDL itself rides a QUERY event — the trigger a real CDC
            # consumer watches (/root/reference/events.go:211-237).
            flush_tx()
            if cfg.stmt_events:
                ddl = ("ALTER TABLE `lake`.`repo_files` "
                       "ADD COLUMN `branch` VARCHAR(16) NULL")
                w.emit_statement(C.QUERY_EVENT, E.query_body(SCHEMA, ddl),
                                 None,
                                 ("QUERY", SCHEMA, ddl, None, None, None))
            evolved = True
            cols = evolved_cols
        ncol = len(cols)
        # MINIMAL images: compute this change's present bitmaps first so
        # the event-grouping flush can split on bitmap changes (rows in
        # one event share the statement-level bitmap)
        present: tuple | None = None
        bpresent: tuple | None = None
        if cfg.minimal_images and ch.op == "U":
            bkey0 = ((ch.before_repo, ch.before_path)
                     if ch.before_repo is not None else key)
            full_b = _pad(before_state[bkey0], ncol)
            full_a = _row(ch, evolved)
            present = tuple(i < 2 or full_a[i] != full_b[i]
                            for i in range(ncol))
            bpresent = tuple(i < 2 for i in range(ncol))
        elif cfg.minimal_images and ch.op == "D":
            present = tuple(i < 2 for i in range(ncol))
        if cur_op is not None and (ch.op != cur_op
                                   or len(rows) >= cfg.rows_per_event
                                   or present != cur_present):
            flush_event()
            if n_ev >= cfg.events_per_tx:
                flush_tx()
        cur_op = ch.op
        cur_present, cur_bpresent = present, bpresent
        if ch.op == "I":
            rows.append(_row(ch, evolved))
            before_state[key] = _row(ch, evolved)
        elif ch.op == "U":
            bkey = ((ch.before_repo, ch.before_path)
                    if ch.before_repo is not None else key)
            full_b = _pad(before_state.pop(bkey) if bkey != key
                          else before_state[bkey], ncol)
            full_a = _row(ch, evolved)
            if present is not None:
                before_rows.append([full_b[0], full_b[1]])
                rows.append([v for v, p in zip(full_a, present) if p])
            else:
                before_rows.append(full_b)
                rows.append(full_a)
            before_state[key] = full_a
        else:  # delete carries the WHERE image (/root/reference/doc.go:53-65)
            full_b = _pad(before_state.pop(key), ncol)
            if present is not None:
                rows.append([full_b[0], full_b[1]])
            else:
                rows.append(full_b)
        w.manifest.n_changes += 1
    flush_tx()
    w._emit(C.ROTATE_EVENT, E.rotate_body(f"binlog.{w.file_no + 1:06d}", 4))
    w.close()

    # persist manifest + golden final state for tests
    import json
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({
            "files": w.manifest.files,
            "chunks": w.manifest.chunks,
            "n_changes": w.manifest.n_changes,
            "n_transactions": w.manifest.n_transactions,
            "n_frames": w.manifest.n_frames,
            "max_tx_rows": w.manifest.max_tx_rows,
        }, f)
    final = script.final_state()
    with open(os.path.join(out_dir, "final_state.jsonl"), "w") as f:
        for (repo, path), row in sorted(final.items()):
            commit, lang, content = row[0], row[1], row[2]
            rec = {"repo": repo, "path": path, "commit": commit,
                   "lang": lang, "content": content}
            if len(row) > 3 and row[3] is not None:
                rec["branch"] = row[3]
            json.dump(rec, f)
            f.write("\n")
    if w.record_events:
        write_goldens(out_dir, final, w.events_log, w.statements_log)
    elif cfg.n_changes <= 500_000:
        # MINIMAL-image fixtures: the per-event emission log assumes full
        # rows, but the final-state golden is image-agnostic
        write_state_golden(out_dir, final)
    return w.manifest


def write_state_golden(out_dir: str, final: dict) -> None:
    import hashlib as _hl

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(final.items())
    state_tbl = pa.table({
        "repo": [k[0] for k, _ in rows],
        "path": [k[1] for k, _ in rows],
        "commit": [r[0] for _, r in rows],
        "lang": [r[1] for _, r in rows],
        "content_sha256": [_hl.sha256((r[2] or "").encode()).hexdigest()
                           for _, r in rows],
    })
    pq.write_table(state_tbl, os.path.join(out_dir, "golden_state.parquet"))


def write_goldens(out_dir: str, final: dict, events_log: list,
                  statements_log: list | None = None) -> None:
    """Generator-side truth as parquet, for the DuckDB oracle twins.

    These are NOT produced by the decoder: the change script's own live
    state and the writer's emission log are the independent reference the
    distributed decode/reduce/merge must reproduce (the role MySQL's test
    server plays in /root/reference/types_test.go:284-328).

      golden_state.parquet   final (repo, path, commit, lang,
                             sha256(content)) — the replay invariant
      golden_events.parquet  one row per change event with op, keys,
                             before-keys, payload digests and commit-order
                             offsets — what decode_changes must emit
    """
    import hashlib as _hl

    import pyarrow as pa
    import pyarrow.parquet as pq

    write_state_golden(out_dir, final)

    cols: dict[str, list] = {k: [] for k in (
        "op", "repo", "path", "before_repo", "before_path", "commit",
        "lang", "content_sha256", "gtid", "seq_in_tx", "log_file",
        "log_pos", "ts_sec")}
    _OPS = {C.WRITE_ROWS_EVENTv2: "I", C.UPDATE_ROWS_EVENTv2: "U",
            C.DELETE_ROWS_EVENTv2: "D",
            C.WRITE_ROWS_EVENTv1: "I", C.UPDATE_ROWS_EVENTv1: "U",
            C.DELETE_ROWS_EVENTv1: "D"}
    last_gtid = object()
    seq = 0
    for log_file, log_pos, ts, gtid, ev_type, ev_rows, before in events_log:
        if gtid != last_gtid:
            seq = 0
            last_gtid = gtid
        op = _OPS[ev_type]
        for i, row in enumerate(ev_rows):
            cols["op"].append(op)
            cols["repo"].append(row[0])
            cols["path"].append(row[1])
            if op == "U":
                cols["before_repo"].append(before[i][0])
                cols["before_path"].append(before[i][1])
            elif op == "D":
                cols["before_repo"].append(row[0])
                cols["before_path"].append(row[1])
            else:
                cols["before_repo"].append(None)
                cols["before_path"].append(None)
            if op == "D":
                cols["commit"].append(None)
                cols["lang"].append(None)
                cols["content_sha256"].append(None)
            else:
                cols["commit"].append(row[2])
                cols["lang"].append(row[3])
                cols["content_sha256"].append(
                    _hl.sha256((row[4] or "").encode()).hexdigest())
            cols["gtid"].append(gtid)
            cols["seq_in_tx"].append(seq)
            seq += 1
            cols["log_file"].append(log_file)
            cols["log_pos"].append(log_pos)
            cols["ts_sec"].append(ts)
    ev_tbl = pa.table({
        **{k: pa.array(v, pa.string()) for k, v in cols.items()
           if k not in ("seq_in_tx", "log_pos", "ts_sec")},
        "seq_in_tx": pa.array(cols["seq_in_tx"], pa.int32()),
        "log_pos": pa.array(cols["log_pos"], pa.int64()),
        "ts_sec": pa.array(cols["ts_sec"], pa.int64()),
    })
    pq.write_table(ev_tbl, os.path.join(out_dir, "golden_events.parquet"))

    if statements_log is None:
        return
    sl = statements_log
    st_tbl = pa.table({
        "log_file": pa.array([s[0] for s in sl], pa.string()),
        "log_pos": pa.array([s[1] for s in sl], pa.int64()),
        "ts_sec": pa.array([s[2] for s in sl], pa.int64()),
        "gtid": pa.array([s[3] for s in sl], pa.string()),
        "stmt_type": pa.array([s[4] for s in sl], pa.string()),
        "schema_name": pa.array([s[5] for s in sl], pa.string()),
        "text": pa.array([s[6] for s in sl], pa.string()),
        "value": pa.array([s[7] for s in sl], pa.string()),
        "n1": pa.array([s[8] for s in sl], pa.int64()),
        "n2": pa.array([s[9] for s in sl], pa.int64()),
    })
    pq.write_table(st_tbl,
                   os.path.join(out_dir, "golden_statements.parquet"))
