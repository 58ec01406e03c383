"""Generate a deterministic sf1 step (10x sf0.1) for the SCALING
second-decade checkpoint (r8, VERDICT item 6).

/root/testdata is read-only and tops out at sf0.1; the 10x step there
has twice been saved by density caveats (the synthetic corpus's flat
unigram vocabulary), so a SECOND decade is measured on a derived sf1:
ten structure-preserving copies of the sf0.1 tables, written to
`.sf1/` (gitignored — ~35 MB, regenerate with `python
tools/make_sf1.py`). pyarrow round-trip keeps the EXACT original
arrow schema (the events timestamps are TIMESTAMP(NANOS); writing
through an engine that narrows them would silently change what
sources/tables.py:load has to handle).

Copy construction, chosen so per-copy structure is preserved and the
interesting cardinalities actually grow (a naive 10x row duplication
would plant 10-cliques of exact duplicates and measure output
explosion, not plan scaling):

- documents: copy i suffixes every token with chr('a'+i-1) — vocab
  and shingle space grow 10x (Heaps-ish), cross-copy similarity is
  zero, per-copy near-dup structure identical. doc_id += i * 10^7,
  n_chars recomputed.
- events: event_id += i * 10^9, user_id += i * 10^7 (10x users);
  ts/value/event_type/props unchanged — the time span stays fixed, so
  this decade measures the per-bucket DENSITY axis.
- embeddings: vec_id += i * 10^7; one coordinate nudged by
  i * 1e-4 so copies are near-but-not-exact duplicates.

Only these three tables scale; the candidate operators load nothing
else (verified in tools/scaling_sf1.py's REP list). The remaining
sf0.1 tables are hard-linked for loader completeness.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parents[1] / ".sf1"
COPIES = 10


def _suffix_tokens(text: str, i: int) -> str:
    if i == 0:
        return text
    suf = chr(ord("a") + i - 1)
    return " ".join(t + suf for t in text.split(" "))


def make_documents() -> None:
    t = pq.read_table(SRC / "documents.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    out = {name: [] for name in t.column_names}
    for i in range(COPIES):
        for j in range(t.num_rows):
            text = _suffix_tokens(cols["text"][j], i)
            out["doc_id"].append(cols["doc_id"][j] + i * 10_000_000)
            out["text"].append(text)
            out["lang"].append(cols["lang"][j])
            out["source"].append(cols["source"][j])
            out["n_chars"].append(len(text))
    schema = t.schema
    pq.write_table(
        pa.table({n: pa.array(out[n], schema.field(n).type) for n in t.column_names},
                 schema=schema),
        OUT / "documents.parquet",
    )


def make_events() -> None:
    t = pq.read_table(SRC / "events.parquet")
    parts = []
    for i in range(COPIES):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name == "event_id":
                col = pa.chunked_array(
                    [pa.compute.add(c, i * 1_000_000_000) for c in col.chunks]
                )
            elif name == "user_id":
                col = pa.chunked_array(
                    [pa.compute.add(c, i * 10_000_000) for c in col.chunks]
                )
            cols[name] = col
        parts.append(pa.table(cols, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), OUT / "events.parquet")


def make_embeddings() -> None:
    t = pq.read_table(SRC / "embeddings.parquet")
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    out_id, out_emb, out_lbl = [], [], []
    for i in range(COPIES):
        for j in range(t.num_rows):
            e = list(embs[j])
            if i:
                e[j % len(e)] = e[j % len(e)] + i * 1e-4
            out_id.append(vec_ids[j] + i * 10_000_000)
            out_emb.append(e)
            out_lbl.append(labels[j])
    schema = t.schema
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_id, schema.field("vec_id").type),
                "embedding": pa.array(out_emb, schema.field("embedding").type),
                "label": pa.array(out_lbl, schema.field("label").type),
            },
            schema=schema,
        ),
        OUT / "embeddings.parquet",
    )


def main() -> None:
    OUT.mkdir(exist_ok=True)
    make_documents()
    make_events()
    make_embeddings()
    for f in SRC.iterdir():
        dst = OUT / f.name
        if not dst.exists():
            os.link(f, dst)
    for f in sorted(OUT.iterdir()):
        print(f"{f.name}: {f.stat().st_size:,} bytes")


if __name__ == "__main__":
    main()
