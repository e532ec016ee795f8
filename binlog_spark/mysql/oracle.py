"""Sequential oracle: decode a binlog dump dir and apply it in order.

Plays the role MySQL itself plays in the reference's round-trip tests
(/root/reference/types_test.go:284-328): a trusted, single-threaded
implementation whose final state the distributed engine must reproduce
byte-for-byte (per-row sha256(content), BASELINE.json:15).

Reads the dump directory in `.next`-chain order
(/root/reference/local.go:35-55) and applies every change record strictly
in log order — insert upserts, update rewrites, delete removes.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

from .decode import ChangeRecord, decode_chunk

REPO_COLS = ("repo", "path", "commit", "lang", "content")


def list_files(dump_dir: str) -> list[str]:
    """Follow the `.next` pointer chain (/root/reference/local.go:35-55)."""
    out = []
    ptr = os.path.join(dump_dir, ".next")
    while os.path.exists(ptr):
        with open(ptr) as f:
            name = f.read().strip()
        if not os.path.exists(os.path.join(dump_dir, name)):
            break
        out.append(name)
        ptr = os.path.join(dump_dir, name + ".next")
    return out


def iter_change_records(dump_dir: str, verify_crc: bool = True
                        ) -> Iterator[ChangeRecord]:
    for name in list_files(dump_dir):
        with open(os.path.join(dump_dir, name), "rb") as f:
            data = f.read()
        yield from decode_chunk(data, name, has_magic=True,
                                verify_crc=verify_crc)


def apply_records(records: Iterator[ChangeRecord],
                  dedup_gtid: bool = True) -> dict[tuple[str, str], dict]:
    """Strict in-order apply with per-(gtid, seq) dedup — the semantics the
    distributed engine must reproduce."""
    state: dict[tuple[str, str], dict] = {}
    seen: set[tuple[str, int]] = set()
    for r in records:
        if dedup_gtid and r.gtid is not None:
            k = (r.gtid, r.seq_in_tx)
            if k in seen:
                continue
            seen.add(k)
        names = r.columns or REPO_COLS
        if r.op in ("I", "U"):
            row = dict(zip(names, r.after))
            if r.op == "U" and r.before is not None:
                bnames = r.before_columns or names
                brow = dict(zip(bnames, r.before))
                bkey = (brow["repo"], brow["path"])
                if r.partial:
                    # MINIMAL after-image: the record PATCHES the row at
                    # the before-key (/root/reference/rbr.go:283-303
                    # surfaces the same columns-present subsets)
                    row = {**state.get(bkey, {}), **row}
                # a key-moving UPDATE vacates the old key (the engine emits
                # a tombstone there — cdc.pipeline.with_key_change_tombstones)
                if bkey != (row["repo"], row["path"]):
                    state.pop(bkey, None)
            state[(row["repo"], row["path"])] = row
        else:
            row = dict(zip(names, r.before))
            state.pop((row["repo"], row["path"]), None)
    return state


def final_state(dump_dir: str) -> dict[tuple[str, str], dict]:
    return apply_records(iter_change_records(dump_dir))


def row_line(row: dict) -> str:
    """Canonical per-row serialization under the digest: key fields,
    sha256(content) (the BASELINE.json:15 invariant), and the non-null
    schema-evolution extras sorted by name."""
    content = row.get("content") or ""
    extras = sorted((k, v) for k, v in row.items()
                    if k not in REPO_COLS and v is not None)
    return "\x1f".join([
        row["repo"], row["path"], row.get("commit") or "",
        row.get("lang") or "",
        hashlib.sha256(content.encode()).hexdigest(),
        "\x1e".join(f"{k}={v}" for k, v in extras)])


def state_digest(state: dict[tuple[str, str], dict]) -> str:
    """Order-insensitive digest of the final state: per-row
    sha256(row_line) summed in two independent 60-bit lanes (mod 2^120).
    A SUM is commutative, so the distributed twin
    (cdc.pipeline.state_fingerprint) computes the identical digest as a
    plain aggregate — no driver-side sort/collect of the table."""
    a = b = 0
    for row in state.values():
        h = hashlib.sha256(row_line(row).encode()).hexdigest()
        a = (a + int(h[0:15], 16)) % (1 << 120)
        b = (b + int(h[16:31], 16)) % (1 << 120)
    return f"{len(state):x}:{a:030x}:{b:030x}"
