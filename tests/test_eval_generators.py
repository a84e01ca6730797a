"""Benchmark-specific eval generators/combiners (L9 depth).

Covers the round-4 additions mirroring
`/root/reference/llava/eval/model_vqa_mmbench.py`,
`model_vqa_loader.py`, `eval_science_qa_gpt4_requery.py`, and the full
review rule set (`llava/eval/table/rule.json`)."""
import base64
import csv
import io
import json

import numpy as np
import pytest

from faithdiff_tpu.eval.generators import (
    build_mmbench_question,
    derotate_answer,
    get_options,
    mmbench_circular_accuracy,
    parse_sqa_answer,
    run_mmbench,
    run_vqa_loader,
    science_qa_requery_eval,
)


def _b64_png(shape=(8, 8, 3), seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, shape, dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _write_mmbench_tsv(path, rows):
    cols = ["index", "question", "hint", "A", "B", "C", "D", "image",
            "answer"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols, delimiter="\t")
        w.writeheader()
        for r in rows:
            w.writerow(r)


class _ContentAwareAgent:
    """Stub agent that finds the lettered option whose text matches a
    target phrase — i.e. a 'model' that understands content, so its
    displayed-letter answer moves with the rotation."""

    def __init__(self, target_by_phrase):
        self.target = target_by_phrase
        self.calls = 0

    def caption(self, image, question):
        self.calls += 1
        for line in question.split("\n"):
            for phrase, _ in self.target.items():
                if ". " in line and phrase in line.split(". ", 1)[1]:
                    if line.split(". ", 1)[1].strip() == phrase:
                        return f"The answer is {line[0]}."
        return "The answer is A."


@pytest.fixture
def mmbench_tsv(tmp_path):
    rows = [
        {"index": "q1", "question": "Which animal?", "hint": "Look closely.",
         "A": "cat", "B": "dog", "C": "bird", "D": "fish",
         "image": _b64_png(seed=1), "answer": "B"},
        # only two options: rotation must run 2 rounds, C/D absent
        {"index": "q2", "question": "Day or night?", "hint": "nan",
         "A": "day", "B": "night", "C": "", "D": "",
         "image": _b64_png(seed=2), "answer": "A"},
    ]
    path = tmp_path / "mmbench.tsv"
    _write_mmbench_tsv(path, rows)
    return str(path)


def test_get_options_stops_at_absent():
    row = {"A": "x", "B": "nan", "C": "y"}
    assert get_options(row) == ["x"]
    row = {"A": "x", "B": "y", "C": None, "D": "z"}
    assert get_options(row) == ["x", "y"]


def test_build_mmbench_question_matches_reference_assembly():
    row = {"question": "Which?", "hint": "H."}
    q = build_mmbench_question(row, ["one", "two"], single_pred_prompt=True)
    assert q.startswith("H.\nWhich?\nA. one\nB. two\n")
    assert q.endswith("letter from the given choices directly.")
    # cn variant (`model_vqa_mmbench.py:96-97`)
    q_cn = build_mmbench_question(row, ["one"], lang="cn")
    assert q_cn.endswith("请直接回答选项字母。")


def test_run_mmbench_circular_rounds(mmbench_tsv, tmp_path):
    agent = _ContentAwareAgent({"dog": "q1", "day": "q2"})
    out = tmp_path / "answers.jsonl"
    n = run_mmbench(agent, mmbench_tsv, str(out), all_rounds=True)
    # q1 has 4 options -> 4 rounds; q2 has 2 -> 2 rounds
    assert n == 6 and agent.calls == 6
    recs = [json.loads(l) for l in open(out)]
    q1 = [r for r in recs if r["question_id"] == "q1"]
    assert [r["round_id"] for r in q1] == [0, 1, 2, 3]
    # round 1 displays options rotated left once; option_char records the
    # original letter at each displayed position
    assert q1[1]["options"] == ["dog", "bird", "fish", "cat"]
    assert q1[1]["option_char"] == ["B", "C", "D", "A"]

    # content-aware agent is circular-consistent: accuracy 1.0
    truths = {"q1": "B", "q2": "A"}
    res = mmbench_circular_accuracy(recs, truths)
    assert res["circular_accuracy"] == 1.0
    assert res["accuracy"] == 1.0
    assert res["count"] == 2


def test_mmbench_circular_catches_position_bias(mmbench_tsv, tmp_path):
    """A position-biased 'model' that always answers A may be right on
    round 0 but must fail circular evaluation."""

    class _AlwaysA:
        def caption(self, image, question):
            return "The answer is A."

    out = tmp_path / "answers.jsonl"
    run_mmbench(_AlwaysA(), mmbench_tsv, str(out), all_rounds=True)
    recs = [json.loads(l) for l in open(out)]
    res = mmbench_circular_accuracy(recs, {"q1": "B", "q2": "A"})
    assert res["circular_accuracy"] == 0.0
    # q2's truth IS 'A' so round-0 plain accuracy is 0.5
    assert res["accuracy"] == 0.5


def test_derotate_answer():
    assert derotate_answer("A", ["B", "C", "D", "A"]) == "B"
    assert derotate_answer("D", ["B", "C", "D", "A"]) == "A"
    assert derotate_answer(None, ["A", "B"]) is None
    assert derotate_answer("D", ["A", "B"]) is None  # out of range


def test_run_vqa_loader_matches_serial(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    questions = []
    for i in range(5):
        name = f"im{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (6, 6, 3), dtype=np.uint8)
        ).save(img_dir / name)
        questions.append({"question_id": i, "image": name,
                          "text": f"what is in image {i}?"})
    qfile = tmp_path / "questions.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in questions))

    class _SumAgent:
        def caption(self, image, question):
            return f"{question}|sum={int(image.sum())}"

    out = tmp_path / "answers.jsonl"
    n = run_vqa_loader(_SumAgent(), str(qfile), str(img_dir), str(out),
                       prefetch=2)
    assert n == 5
    recs = [json.loads(l) for l in open(out)]
    assert [r["question_id"] for r in recs] == list(range(5))
    for i, r in enumerate(recs):
        img = np.asarray(Image.open(img_dir / f"im{i}.png").convert("RGB"))
        assert r["text"] == f"what is in image {i}?|sum={int(img.sum())}"


def test_run_vqa_loader_propagates_decode_error(tmp_path):
    (tmp_path / "imgs").mkdir()
    qfile = tmp_path / "q.jsonl"
    qfile.write_text(json.dumps({"question_id": 0, "image": "missing.png",
                                 "text": "?"}))

    class _Agent:
        def caption(self, image, question):
            return "x"

    with pytest.raises(FileNotFoundError):
        run_vqa_loader(_Agent(), str(qfile), str(tmp_path / "imgs"),
                       str(tmp_path / "a.jsonl"))


def test_parse_sqa_answer():
    assert parse_sqa_answer("Blah. The answer is C.") == "C"
    assert parse_sqa_answer("no answer here") == "FAILED"
    # two matches -> FAILED (reference requires exactly one)
    assert parse_sqa_answer(
        "The answer is A. The answer is B.") == "FAILED"


def test_science_qa_requery_eval_accounting():
    problems = {
        "p1": {"choices": ["x", "y"], "answer": 1},
        "p2": {"choices": ["x", "y", "z"], "answer": 0},
        "p3": {"choices": ["x", "y"], "answer": 0},
    }
    ours = {
        "p1": {"text": "The answer is B."},     # correct
        "p2": {"text": "The answer is B."},     # wrong (truth A)
        "p3": {"text": "The answer is A."},     # correct
    }
    requery = {
        "p1": {"text": "The answer is A."},     # parsed, wrong -> used
        "p2": {"text": "garbled"},              # FAILED -> falls back to ours
        # p3 missing -> missing_requery, falls back to ours
    }
    gpt4 = {
        "p1": {"text": "The answer is B."},
        "p2": {"text": "The answer is A."},
        "p3": {"text": "nope"},                 # FAILED -> random draw
    }
    gpt4 = {k: v["text"] for k, v in gpt4.items()}

    out = science_qa_requery_eval(problems, ["p1", "p2", "p3"], ours,
                                  requery, gpt4, seed=0)
    b = out["breakdown"]
    assert b["total"] == 3
    assert b["our_correct"] == 2
    # requery: p1 uses requery (wrong), p2 falls back to ours (wrong),
    # p3 falls back to ours (correct)
    assert out["correct"] == 1
    assert b["missing_requery"] == 1
    assert b["gpt4_failed"] == 1
    assert out["results"]["p1"] == 0      # requery's A
    assert out["results"]["p3"] == 0      # ours


def test_default_rules_full_set():
    """The shipped rule set must carry every category of the reference's
    `llava/eval/table/rule.json` (round-3 verdict: the built-in subset
    was 'default' only)."""
    from faithdiff_tpu.eval.gpt_review import DEFAULT_RULES

    assert set(DEFAULT_RULES) >= {
        "coding", "math", "default", "conv", "detail", "complex",
        "llava_bench_conv", "llava_bench_detail", "llava_bench_complex"}
    for rule in DEFAULT_RULES.values():
        assert rule["role"] == "Assistant"
        assert "score" in rule["prompt"]
