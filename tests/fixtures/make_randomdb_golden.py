"""Regenerate the src01 golden oracle parquet from the PURE-PYTHON
reference implementation (tests/xxh64_ref.py) — run from the repo
root:

    python tests/fixtures/make_randomdb_golden.py

Writes tests/fixtures/randomdb_account_golden.parquet: the 10k-row
ACCOUNT table that sources/randomdb.py must produce for the declared
src01 spec (seed 42). The file is committed; the src01 DuckDB oracle
is `SELECT ... FROM read_parquet(<this file>)`, which closes the one
rows-only gap in the correctness surface: the generator's xxhash64
cells have no DuckDB analog, but they DO have this independently
computed expectation. tests/test_sources.py re-derives a slice on
every run so a stale golden or a generator regression fails loudly.

Cell semantics replicated from sources/randomdb.py (which itself
mirrors the reference's src/RandomDB.java value model):
  aid     PK INTEGER 50000: affine permutation (a*id + b) mod range,
          a coprime via the crc32-salted column seed
  branch  NK INTEGER 16:   xxhash64(id, 'branch:42') & 0xFFFFFFFF mod 16
  owner   NK STRING 8:     chr(97 + u32(id, 'owner:42', j) mod 26), j=0..7
  balance NK REAL 1000:    u32(id, 'balance:42') / 2^32 * 1000 as float32
"""

from __future__ import annotations

import math
import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.xxh64_ref import u32  # noqa: E402

N_ROWS = 10_000
SEED = 42
PK_RANGE = 50_000

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "randomdb_account_golden.parquet")


def _coprime(range_: int, seed: int) -> int:
    a = (seed * 2654435761 + 1) % range_ or 1
    while math.gcd(a, range_) != 1:
        a += 1
    return a


def account_rows(n: int = N_ROWS, seed: int = SEED):
    """Yield (aid, branch, owner, balance) exactly as randomdb.py's
    Spark expressions compute them, from the pure-Python hash."""
    col_seed = seed + zlib.crc32(f"aid:{seed}".encode())
    a = _coprime(PK_RANGE, col_seed)
    b = (col_seed * 40503) % PK_RANGE
    for rid in range(n):
        aid = (rid * a + b) % PK_RANGE
        branch = u32(("long", rid), ("str", f"branch:{seed}")) % 16
        owner = "".join(
            chr(97 + u32(("long", rid), ("str", f"owner:{seed}"), ("int", j)) % 26)
            for j in range(8)
        )
        balance = np.float32(
            u32(("long", rid), ("str", f"balance:{seed}")) / float(2**32) * 1000.0
        )
        yield aid, branch, owner, balance


def main() -> None:
    cols = list(zip(*account_rows()))
    table = pa.table(
        {
            "aid": pa.array(cols[0], pa.int32()),
            "branch": pa.array(cols[1], pa.int32()),
            "owner": pa.array(cols[2], pa.string()),
            "balance": pa.array(np.array(cols[3], dtype=np.float32), pa.float32()),
        }
    )
    pq.write_table(table, GOLDEN, compression="zstd")
    print(f"wrote {GOLDEN}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
