"""Build a deterministic ~NxSF replica corpus for scaling measurements.

The driver ships fixtures only up to sf0.1; the 2x-of-baseline gate and the
100 TB design arguments deserve at least one measured order-of-magnitude
slope. This tool replicates the sf0.1 `documents`, `embeddings`, and
(since r8, with consistent key shifts) `events`/`orders`/`lineitem` tables
N times (default 10 -> "sf1-ish") with REMAPPED ids and a per-replica token
prefix so each replica's shingle space is disjoint: the near-duplicate
structure inside every replica is preserved, total near-pairs scale
linearly, and LSH buckets grow ~1x per replica instead of degenerating
into one giant exact-duplicate bucket (which would measure the hot-bucket
cap, not the scaling slope). Every other table is byte-copied, so the
output dir is a drop-in `--sf-dir` for tools/check_oracle.py — the same
hash-match discipline applies because BOTH engines read the same parquet.

Usage:
    python tools/make_scale_corpus.py [--src /root/testdata/sf0.1]
        [--dest /tmp/sdcms_sfscale10] [--replicas 10]

Determinism: no RNG anywhere — ids shift by replica * (max_id + 1), text
tokens get a fixed "r{i}:" prefix, and embeddings get a PER-REPLICA
ORTHOGONAL TRANSFORM (a multiplicative-hash sign pattern; signs ONLY, no
dimension rotation — see scale_embeddings). Replica 0 is byte-identical
to the source rows.

Why a transform and not a perturbation (VERDICT r11 ask #1): r11's
fixture shifted one component by r*1e-3, which left every replica of a
vector a GENUINE near-dup of every other replica — true output pairs grew
~quadratically in replicas (9.5x pairs for 3x data), so scaling slopes of
near-dup operators measured fixture pair density, not the engine. An
orthogonal transform preserves every INTRA-replica cosine exactly (the
planted near-dup structure replicates 1:1, totals scale linearly — the
embedding analog of the text side's disjoint "r{i}:" shingle prefixes)
while cross-replica cosines collapse to generic inner products (measured
< 0.5 on the fixture vs the 0.9+ dedup thresholds).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdc_mapreduce_spark.catalog import TABLES, table_path


def scale_documents(src: str, dest: str, replicas: int) -> int:
    tbl = pq.read_table(table_path(src, "documents"))
    doc_id = tbl.column("doc_id").to_pylist()
    text = tbl.column("text").to_pylist()
    lang = tbl.column("lang").to_pylist()
    source = tbl.column("source").to_pylist()
    n_chars = tbl.column("n_chars").to_pylist()
    shift = max(doc_id) + 1
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    total = 0
    # stream one row group per replica: the 100x corpus must not hold
    # every replica's text in python lists at once
    with pq.ParquetWriter(table_path(dest, "documents"), schema) as writer:
        for r in range(replicas):
            out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
            for i in range(len(doc_id)):
                out["doc_id"].append(doc_id[i] + r * shift)
                if r == 0:
                    t = text[i]
                    out["n_chars"].append(n_chars[i])
                else:
                    t = " ".join(f"r{r}:{tok}" for tok in text[i].split())
                    out["n_chars"].append(len(t))
                out["text"].append(t)
                out["lang"].append(lang[i])
                out["source"].append(source[i])
            writer.write_table(pa.table(out, schema=schema))
            total += len(out["doc_id"])
    return total


def _replica_signs(dim: int, r: int) -> list[int]:
    """Deterministic ±1 pattern for replica r (Knuth multiplicative hash
    over (component, replica) — pure integer arithmetic, engine-free)."""
    return [
        -1 if (((i + dim * r) * 2654435761) >> 16) & 1 else 1
        for i in range(dim)
    ]


def scale_embeddings(src: str, dest: str, replicas: int) -> int:
    tbl = pq.read_table(table_path(src, "embeddings"))
    vec_id = tbl.column("vec_id").to_pylist()
    emb = tbl.column("embedding").to_pylist()
    label = tbl.column("label").to_pylist()
    shift = max(vec_id) + 1
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    total = 0
    with pq.ParquetWriter(table_path(dest, "embeddings"), schema) as writer:
        for r in range(replicas):
            out_id, out_emb, out_label = [], [], []
            if r and emb:
                dim = len(emb[0])
                signs = _replica_signs(dim, r)
            for i in range(len(vec_id)):
                out_id.append(vec_id[i] + r * shift)
                v = list(emb[i])
                if r:
                    # per-replica ORTHOGONAL transform: sign flips ONLY.
                    # Negation is exact in IEEE float AND preserves the
                    # term ORDER of every downstream dot product (s_i^2=1
                    # term-by-term), so intra-replica cosines are truly
                    # bit-exact — planted near-dup pairs replicate 1:1 and
                    # totals scale linearly. (r12 additionally rotated the
                    # dimensions; ADVICE r12: the rotation reordered the
                    # FP summation inside engine dot products, so replica
                    # cosines could drift ~1 ulp and a threshold-boundary
                    # pair could flip per replica — dropped.) Cross-replica
                    # cosines collapse to random-sign sums far below
                    # near-dup thresholds; distinct replicas get distinct
                    # hash sign patterns, so no two replicas coincide.
                    v = [s * x for s, x in zip(signs, v)]
                out_emb.append(v)
                out_label.append(label[i])
            writer.write_table(
                pa.table(
                    {"vec_id": out_id, "embedding": out_emb, "label": out_label},
                    schema=schema,
                )
            )
            total += len(out_id)
    return total


def _replicate_with_key_shift(
    src_path: str, dest_path: str, replicas: int, shifts: dict[str, int]
) -> int:
    """Replicate a table N times, shifting each column named in ``shifts``
    by replica * shifts[col]. Callers pass the SAME shift value for key
    columns that must stay joined across tables (o_orderkey <->
    l_orderkey); foreign keys into non-replicated dims are simply not
    listed and stay intact. Schema (including TIMESTAMP(NANOS) columns)
    passes through untouched."""
    import pyarrow.compute as pc

    tbl = pq.read_table(src_path)
    total = 0
    # one row group per replica, streamed (a 100x fact table must not be
    # concatenated in memory)
    with pq.ParquetWriter(dest_path, tbl.schema) as writer:
        for r in range(replicas):
            if r == 0:
                part = tbl
            else:
                cols = {}
                for name in tbl.schema.names:
                    col = tbl.column(name)
                    if name in shifts:
                        col = pc.add(col, r * shifts[name]).cast(
                            tbl.schema.field(name).type
                        )
                    cols[name] = col
                part = pa.table(cols, schema=tbl.schema)
            writer.write_table(part)
            total += part.num_rows
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/sdcms_sfscale10")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    import pyarrow.compute as pc

    os.makedirs(args.dest, exist_ok=True)
    nd = scale_documents(args.src, args.dest, args.replicas)
    ne = scale_embeddings(args.src, args.dest, args.replicas)
    # fact tables replicate with consistent key shifts; dims stay as-is —
    # the star-schema scale pattern (fact grows, dims don't)
    okey_shift = (
        pc.max(
            pq.read_table(table_path(args.src, "orders"), columns=["o_orderkey"])
            .column("o_orderkey")
        ).as_py()
        + 1
    )
    nev = _replicate_with_key_shift(
        table_path(args.src, "events"),
        table_path(args.dest, "events"),
        args.replicas,
        {"event_id": 10_000_000},
    )
    nor = _replicate_with_key_shift(
        table_path(args.src, "orders"),
        table_path(args.dest, "orders"),
        args.replicas,
        {"o_orderkey": okey_shift},
    )
    nli = _replicate_with_key_shift(
        table_path(args.src, "lineitem"),
        table_path(args.dest, "lineitem"),
        args.replicas,
        {"l_orderkey": okey_shift},
    )
    for t in TABLES:
        if t in ("documents", "embeddings", "events", "orders", "lineitem"):
            continue
        shutil.copyfile(table_path(args.src, t), table_path(args.dest, t))
    print(
        f"wrote {args.dest}: documents={nd} embeddings={ne} events={nev} "
        f"orders={nor} lineitem={nli} (x{args.replicas} of {args.src}); "
        "dims byte-copied"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
