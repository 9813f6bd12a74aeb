"""Property tests for the shared push-row normalization
(`schema.normalize_push_row`) — the single rule the REST
/add_documents door and the CLI `push` verb both apply. The round-9
null-path bug lived exactly here (a null `file_path` resolved to path
"" but the CLI still keyed it as alias-present), so the invariants are
pinned at the unit level, Spark-free.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from converttovectordb_spark.schema import (
    DimensionMismatch,
    normalize_push_row,
)

# values a JSON producer could put in path/file_path
path_values = st.one_of(
    st.none(),
    st.text(max_size=20),
    st.just("a/b/c.py"),
)


def _maybe(d: dict, key, val, present: bool) -> dict:
    if present:
        d[key] = val
    return d


row_dicts = st.builds(
    lambda content, p, p_in, fp, fp_in, ci, ci_in: _maybe(
        _maybe(
            _maybe({"content": content}, "path", p, p_in),
            "file_path", fp, fp_in,
        ),
        "chunk_index", ci, ci_in,
    ),
    content=st.text(max_size=30),
    p=path_values,
    p_in=st.booleans(),
    fp=path_values,
    fp_in=st.booleans(),
    ci=st.integers(min_value=-5, max_value=5),
    ci_in=st.booleans(),
)


@settings(max_examples=300, deadline=None)
@given(doc=row_dicts, default_ci=st.integers(min_value=0, max_value=99))
def test_resolution_invariants(doc, default_ci):
    row = normalize_push_row(doc, dim=None, now=123.0,
                             default_chunk_index=default_ci)
    path, ext, chunk_index, total_chunks, content, emb, ts = row
    # path resolves through the documented or-chain — null/empty
    # aliases land on "" exactly like an absent key
    assert path == (doc.get("path") or doc.get("file_path") or "")
    # explicit chunk_index always wins; otherwise the caller's default
    # (the CLI passes a unique line number for identity-less rows)
    if "chunk_index" in doc:
        assert chunk_index == int(doc["chunk_index"])
    else:
        assert chunk_index == default_ci
    assert content == doc["content"]
    assert total_chunks == 1 and emb is None and ts == 123.0
    # extension derives from the RESOLVED path's basename
    if "." in path.rsplit("/", 1)[-1][1:]:
        assert ext is not None


@settings(max_examples=100, deadline=None)
@given(
    emb=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=8,
    )
)
def test_embedding_roundtrip_and_dim_guard(emb):
    doc = {"content": "x", "embedding": emb}
    row = normalize_push_row(doc, dim=len(emb), now=0.0)
    assert row[5] == [float(x) for x in emb]
    assert all(not math.isnan(x) for x in row[5])
    with pytest.raises(DimensionMismatch):
        normalize_push_row(doc, dim=len(emb) + 1, now=0.0)


@pytest.mark.parametrize(
    "doc",
    [
        {"content": None},
        {"content": 3},
        {},
        {"content": "x", "path": 7},
        {"content": "x", "extension": 9},
        {"content": "x", "embedding": "nope"},
        {"content": "x", "embedding": [1.0, "a"]},
        {"content": "x", "chunk_index": "z"},
        {"content": "x", "timestamp": "z"},
        "not a dict",
    ],
)
def test_invalid_rows_raise_valueerror(doc):
    with pytest.raises(ValueError):
        normalize_push_row(doc, dim=None, now=0.0)
