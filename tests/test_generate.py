"""Contract tests for the post-retrieval ai_generate seam
(operators/generate.py) — the engine-side expression of the reference's
downstream LLM stage (estimate_time.py:30-78: read results → assemble
prompt → chat call). Same policy as the embedder seam: deterministic
fake in-container, injectable real client, NO queries() entry
(generation is nondeterministic by nature)."""
import hashlib

import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.embeddings import hash_embedder
from converttovectordb_spark.engine import VectorEngine
from converttovectordb_spark.operators.generate import (
    PROMPT_TEMPLATE,
    ai_generate,
    assemble_context,
    fake_generator,
    http_chat_generator,
    rag_prompt,
)


def _expected_fake(prompt: str) -> str:
    return (
        "FAKE[" + hashlib.sha1(prompt.encode()).hexdigest()[:8] + "] "
        + prompt[:40].replace("\n", " ")
    )


def test_ai_generate_batched_deterministic(spark):
    """One generation per row, Arrow-batched, exactly the fake's
    deterministic output — the UDF must not alter or reorder prompts."""
    df = spark.createDataFrame(
        [(i, f"prompt number {i}") for i in range(100)], ["id", "prompt"]
    )
    out = {r.id: r.generation for r in ai_generate(df).collect()}
    assert len(out) == 100
    for i in range(100):
        assert out[i] == _expected_fake(f"prompt number {i}")


def test_ai_generate_null_prompt_is_empty_string(spark):
    df = spark.createDataFrame([(1, None)], "id int, prompt string")
    row = ai_generate(df).collect()[0]
    assert row.generation == _expected_fake("")


def test_ai_generate_custom_generator_and_column(spark):
    df = spark.createDataFrame([("doc a",), ("doc b",)], ["content"])
    out = ai_generate(
        df,
        prompt_col=F.concat(F.lit("Summarize: "), F.col("content")),
        out_col="summary",
        generator=lambda ps: [p.upper() for p in ps],
    )
    assert [r.summary for r in out.collect()] == [
        "SUMMARIZE: DOC A",
        "SUMMARIZE: DOC B",
    ]


def test_http_chat_generator_contract():
    """Constructing the real-client seam succeeds; calling it in this
    environment raises with injection instructions (mirrors the
    sentence_transformer_embedder contract)."""
    gen = http_chat_generator()
    with pytest.raises(NotImplementedError, match="inject"):
        gen(["hello"])


def test_assemble_context_orders_best_first(spark):
    hits = spark.createDataFrame(
        [
            ("b.py", 0.5, "beta\n\ncontent"),
            ("a.py", 0.9, "alpha content"),
            ("c.py", 0.1, "gamma content"),
        ],
        ["path", "score", "content"],
    )
    row = assemble_context(hits).collect()[0]
    assert row.n_results == 3
    blocks = row.context.split("Result (score=")
    # best-first ordering, embedded blank lines in content preserved
    assert "a.py" in blocks[1]
    assert "b.py" in blocks[2] and "beta\n\ncontent" in row.context
    assert "c.py" in blocks[3]


def test_assemble_context_truncates_each_result(spark):
    hits = spark.createDataFrame(
        [("a.py", 0.9, "x" * 5000)], ["path", "score", "content"]
    )
    row = assemble_context(hits, max_chars_per_result=100).collect()[0]
    assert "x" * 100 in row.context and "x" * 101 not in row.context


def _engine(spark, tmp_path):
    eng = VectorEngine(
        spark,
        str(tmp_path / "store"),
        embedder=hash_embedder(16),
        dim=16,
        chunk_size=200,
        overlap=40,
    )
    repo = tmp_path / "repo"
    repo.mkdir()
    (repo / "greet.py").write_text(
        "def greet(name):\n    return f'hello {name}'\n" * 10
    )
    (repo / "math_util.py").write_text(
        "def add(a, b):\n    return a + b\n" * 10
    )
    eng.ingest(str(repo))
    return eng


def test_engine_answer_end_to_end(spark, tmp_path):
    """search → assemble_context → rag_prompt → ai_generate as one
    verb; the prompt carries the reference's instruction frame and the
    retrieved context, and the fake generation is reproducible."""
    eng = _engine(spark, tmp_path)
    row = eng.answer("hello greeting function", top_k=3).collect()[0]
    assert row.n_results >= 1
    head = PROMPT_TEMPLATE.partition("{question}")[0]
    assert row.prompt.startswith(head)
    assert "hello greeting function" in row.prompt
    assert "Relevant Code and Context" in row.prompt
    assert "greet.py" in row.prompt
    assert row.generation == _expected_fake(row.prompt)


def test_engine_answer_empty_store(spark, tmp_path):
    """Never-ingested store: still one answer row (n_results=0) — the
    reference returns empty results, not an error."""
    eng = VectorEngine(
        spark, str(tmp_path / "nostore"), embedder=hash_embedder(16), dim=16
    )
    row = eng.answer("anything").collect()[0]
    assert row.n_results == 0
    assert row.generation.startswith("FAKE[")


def test_rag_prompt_renders_template(spark):
    df = spark.createDataFrame([("CTX",)], ["context"])
    got = df.select(rag_prompt("Q?").alias("p")).collect()[0].p
    assert got == PROMPT_TEMPLATE.format(question="Q?", context="CTX")


GOLDEN_REPORT = """# Implementation Time Estimate Report

## Time Estimate
- **Range**: 4 to 10 hours
- **Confidence**: Medium

## Complexity
- **Assessment**: Medium

## Key Factors
- existing vector search engine
- parquet store already partitioned

## Potential Challenges
- float tie-breaking
- stream state sizing

## Implementation Tasks
### wire the endpoint (2 hours)
expose the search verb

### add tests (3 hours)
golden-file coverage

**Total Hours (Sum of Tasks)**: 5"""


def test_format_report_golden():
    """format_report renders the reference's markdown report shape
    (estimate_time.py:105-153) byte-for-byte for a well-formed
    generation payload."""
    import json

    from converttovectordb_spark.operators.generate import format_report

    payload = json.dumps(
        {
            "time_estimate": {
                "min_hours": 4, "max_hours": 10, "confidence": "Medium"
            },
            "complexity": "Medium",
            "key_factors": [
                "existing vector search engine",
                "parquet store already partitioned",
            ],
            "potential_challenges": [
                "float tie-breaking",
                "stream state sizing",
            ],
            "tasks": [
                {"name": "wire the endpoint", "hours": 2,
                 "description": "expose the search verb"},
                {"name": "add tests", "hours": 3,
                 "description": "golden-file coverage"},
            ],
        }
    )
    assert format_report(payload) == GOLDEN_REPORT


def test_format_report_degrades_gracefully():
    """Malformed LLM output is an expected input: non-JSON and
    missing-key payloads return an error preamble + the raw response
    (reference estimate_time.py:150-153), never raise."""
    from converttovectordb_spark.operators.generate import format_report

    out = format_report("not json at all")
    assert out.startswith("Error: Could not parse LLM response as JSON.")
    assert "not json at all" in out

    out = format_report('{"complexity": "Low"}')
    assert out.startswith("Error: Missing key in JSON response:")
    assert '"complexity": "Low"' in out
