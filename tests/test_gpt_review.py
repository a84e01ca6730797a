"""GPT-review harness: prompt builder, score parser, runner, summarizer."""
import json

from faithdiff_tpu.eval.gpt_review import (DEFAULT_RULES,
                                           build_review_content,
                                           format_context, main, parse_score,
                                           review_answers, summarize_reviews)


def test_parse_score_reference_semantics():
    assert parse_score("7 9\ngood") == [7.0, 9.0]
    assert parse_score("7, 9\nmore") == [7.0, 9.0]
    assert parse_score("no scores here at all") == [-1.0, -1.0]
    assert parse_score("") == [-1.0, -1.0]


def test_build_review_content_layout():
    c = build_review_content("Q?", "A1", "A2", DEFAULT_RULES["default"])
    assert c.startswith("[Question]\nQ?\n\n")
    assert "[Assistant 1]\nA1\n\n[End of Assistant 1]\n\n" in c
    assert "[Assistant 2]\nA2\n\n[End of Assistant 2]\n\n" in c
    assert c.index("[Assistant 1]") < c.index("[Assistant 2]") < c.index("[System]")


def test_context_block_prepended():
    ctx = format_context({"captions": ["a cat"], "instances":
                          [{"category": "cat", "bbox": [1, 2, 3, 4]}]})
    c = build_review_content("Q?", "A1", "A2", DEFAULT_RULES["default"], ctx)
    assert c.startswith("[Context]\na cat\n\ncat: [1, 2, 3, 4]\n\n[Question]")


def _records(n):
    qs = [{"question_id": i, "text": f"q{i}", "category": "default"}
          for i in range(n)]
    a1 = [{"question_id": i, "answer_id": f"x{i}", "text": "short"}
          for i in range(n)]
    a2 = [{"question_id": i, "answer_id": f"y{i}", "text": "detailed"}
          for i in range(n)]
    return qs, a1, a2


def test_review_runner_with_fake_backend_and_resume():
    calls = []

    def backend(content, system, max_tokens):
        calls.append(content)
        return "6 8\nAssistant 2 gave more detail."

    qs, a1, a2 = _records(3)
    recs = list(review_answers(qs, a1, a2, backend, done_ids={1}))
    assert len(recs) == 2  # question 1 skipped (resume)
    assert len(calls) == 2
    assert all(r["tuple"] == [6.0, 8.0] for r in recs)
    assert recs[0]["answer1_id"] == "x0" and recs[0]["answer2_id"] == "y0"


def test_summarize_matches_reference_math():
    recs = [
        {"question_id": 0, "category": "detail", "tuple": [5.0, 10.0]},
        {"question_id": 1, "category": "detail", "tuple": [5.0, 5.0]},
        {"question_id": 2, "category": "conv", "tuple": [8.0, 4.0]},
    ]
    t = summarize_reviews(recs)
    # detail: mean1=5, mean2=7.5 -> relative 150.0, scores x10
    assert t["detail"] == {"count": 2, "score1": 50.0, "score2": 75.0,
                           "relative": 150.0}
    assert t["conv"]["relative"] == 50.0
    assert t["all"]["count"] == 3
    # ignore list drops records
    t2 = summarize_reviews(recs, ignore=[2])
    assert "conv" not in t2 and t2["all"]["count"] == 2


def test_cli_review_and_summarize(tmp_path):
    qs, a1, a2 = _records(2)
    qf, a1f, a2f = tmp_path / "q.jsonl", tmp_path / "a1.jsonl", tmp_path / "a2.jsonl"
    for path, recs in ((qf, qs), (a1f, a1), (a2f, a2)):
        path.write_text("".join(json.dumps(r) + "\n" for r in recs))
    out = tmp_path / "reviews.jsonl"
    main(["review", "-q", str(qf), "-a", str(a1f), str(a2f),
          "-o", str(out), "--backend",
          "tests.test_gpt_review:fake_backend"])
    recs = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(recs) == 2 and recs[0]["tuple"] == [3.0, 9.0]
    # resume: running again adds nothing
    main(["review", "-q", str(qf), "-a", str(a1f), str(a2f),
          "-o", str(out), "--backend",
          "tests.test_gpt_review:fake_backend"])
    assert len(out.read_text().splitlines()) == 2
    main(["summarize", "-f", str(out)])


def fake_backend(content, system, max_tokens):
    return "3 9\nreasoning"
