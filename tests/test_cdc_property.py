"""Property-based pins for content-defined chunking: a pure-Python
reference mirrors the SQL arithmetic exactly; hypothesis then drives
the properties the corpus oracle can't exhaustively witness —
chunking always PARTITIONS the document, and an edit re-synchronizes
after a bounded horizon (the CDC property itself)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from flink_template_spark.plans.text_dedup import (
    _CDC_BPOW,
    _CDC_D,
    _CDC_P,
    _CDC_W,
)


def _md5int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def cdc_ref(tokens: list[str]) -> list[str]:
    """Pure-Python mirror of the engine's chunking arithmetic
    (text_dedup._cdc_whash_sql + the boundary/idx windows)."""
    th = [_md5int32(t) for t in tokens]
    chunks: list[list[str]] = [[]]
    for pos, tok in enumerate(tokens):
        chunks[-1].append(tok)
        if pos >= _CDC_W - 1:
            whash = (
                sum(
                    ((th[pos - j] % _CDC_P) * _CDC_BPOW[j]) % _CDC_P
                    for j in range(_CDC_W)
                )
                % _CDC_P
            )
            if whash % _CDC_D == 0 and pos != len(tokens) - 1:
                chunks.append([])
    return [" ".join(c) for c in chunks if c]


# hypothesis vocabulary: small alphabet so boundary collisions and
# repeated content actually happen
_token = st.text(alphabet="abcd", min_size=1, max_size=3)
_tokens = st.lists(_token, min_size=1, max_size=120)


@given(_tokens)
@settings(max_examples=200, deadline=None)
def test_chunks_partition_the_document(tokens):
    chunks = cdc_ref(tokens)
    assert " ".join(chunks) == " ".join(tokens)
    assert all(chunks)  # no empty chunks


@given(_tokens, _tokens)
@settings(max_examples=200, deadline=None)
def test_edit_resynchronizes_suffix_chunks(prefix, shared):
    """THE content-defined property: two documents sharing a suffix
    agree on every chunk that starts at least W tokens into the shared
    region and does not touch the final (forced) boundary — an edit's
    blast radius is bounded by the hash window, not the document."""
    a = cdc_ref(shared)
    b = cdc_ref(prefix + shared)
    # alignment-free statement: chunks fully inside the shared suffix
    # (past the first W tokens of it) must appear in both chunkings,
    # except possibly each document's LAST chunk (doc end forces a
    # boundary the other document may not have).
    def interior_shared_chunks(chunks, skip_tokens):
        out, seen = [], 0
        for c in chunks[:-1]:  # last chunk is end-forced
            n = len(c.split(" "))
            if seen >= skip_tokens:
                out.append(c)
            seen += n
        return out

    # tokens of `a` before which re-sync must have happened: W window
    # plus up to one chunk that straddles the edit point
    horizon = _CDC_W + _CDC_D * 4
    a_tail = interior_shared_chunks(a, horizon)
    b_chunks = set(b)
    missing = [c for c in a_tail if c not in b_chunks]
    # every interior chunk past the horizon re-appears identically
    assert not missing, (missing, a, b)


def test_spark_chunking_matches_reference(spark):
    """Differential: the engine's distributed chunking equals the
    pure-Python reference on adversarial docs (repeats, short docs,
    boundary-heavy small alphabets)."""
    import flink_template_spark.plans.text_dedup as TD
    from pyspark.sql import functions as F

    docs = [
        (1, "a"),
        (2, " ".join(["ab"] * 50)),
        (3, " ".join("abcd"[i % 4] for i in range(97))),
        (4, " ".join(f"t{i % 7}" for i in range(64))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        TD.cdc_chunk_table(df)
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "ctext")
        .collect()
    )
    by_doc: dict[int, list[str]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["ctext"])
    for did, text in docs:
        assert by_doc[did] == cdc_ref(text.split(" ")), did
