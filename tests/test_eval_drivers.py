"""L9 tail: per-benchmark CLI drivers (textvqa/pope), the ScienceQA
generator, the llava-bench GPT-review variant, and the text-only QA
baseline — vs the reference's standalone scripts
(`eval_textvqa.py`, `eval_pope.py`, `model_vqa_science.py`,
`eval_gpt_review_bench.py`, `qa_baseline_gpt35.py`)."""
import json
import os

import numpy as np
import pytest

from faithdiff_tpu.eval.drivers import (eval_pope_category,
                                        eval_textvqa_single,
                                        textvqa_prompt_processor)
from faithdiff_tpu.eval.generators import run_science_qa
from faithdiff_tpu.eval.gpt_review import (DEFAULT_RULES,
                                           format_bench_context,
                                           generate_qa_baseline,
                                           review_answers)
from faithdiff_tpu.eval.scorers import pope_normalize_answer


def test_textvqa_prompt_processor_forms():
    # the three prompt layouts the reference recognises
    assert textvqa_prompt_processor(
        "OCR tokens: foo bar Question: What Time? Short answer:") \
        == "what time?"
    assert textvqa_prompt_processor(
        "Reference OCR token: abc\nWhat brand?\nAnswer briefly.") \
        == "what brand?"
    assert textvqa_prompt_processor(
        "What colour?\nAnswer the question using a single word.") \
        == "what colour?"
    with pytest.raises(ValueError):
        textvqa_prompt_processor("one\ntwo\nthree\nfour")


def test_eval_textvqa_single(tmp_path):
    ann = {"data": [
        {"image_id": "img0", "question": "What Colour?",
         "answers": ["red"] * 10},
        {"image_id": "img1", "question": "How many?",
         "answers": ["two"] * 5 + ["three"] * 5},
    ]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    res_file = tmp_path / "res.jsonl"
    with open(res_file, "w") as f:
        f.write(json.dumps({
            "question_id": "img0", "text": "Red.",
            "prompt": "What Colour?\nAnswer using a single word."}) + "\n")
        f.write(json.dumps({
            "question_id": "img1", "text": "two",
            "prompt": "How many?\nAnswer using a single word."}) + "\n")
    out = eval_textvqa_single(str(ann_file), str(res_file))
    assert out["samples"] == 2
    # q0: all 10 humans say red -> 1.0; q1: "two" leave-one-out
    # = (5*min(1,4/3) + 5*min(1,5/3))/10 = 1.0 -> mean 100%
    assert out["accuracy"] == pytest.approx(100.0)


def test_pope_normalize_matches_reference_rule():
    assert pope_normalize_answer("Yes, there is a dog.") == "yes"
    assert pope_normalize_answer("No") == "no"
    assert pope_normalize_answer("I do not think so. Maybe yes.") == "no"
    # 'no' must match as a WORD in the first sentence, not a substring
    assert pope_normalize_answer("There is a notebook.") == "yes"
    # undecidable counts as yes (the reference's else-branch)
    assert pope_normalize_answer("hard to tell") == "yes"


def test_eval_pope_category(tmp_path):
    label_file = tmp_path / "coco_pope_random.json"
    with open(label_file, "w") as f:
        for lbl in ["yes", "no", "yes", "no"]:
            f.write(json.dumps({"label": lbl}) + "\n")
    answers = [{"text": "Yes, it is."}, {"text": "No."},
               {"text": "There is not one."}, {"text": "maybe"}]
    m = eval_pope_category(answers, str(label_file))
    # preds: yes, no, no, yes vs labels yes, no, yes, no
    assert m["samples"] == 4
    assert m["accuracy"] == 0.5
    assert m["precision"] == 0.5 and m["recall"] == 0.5


def test_run_science_qa(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "p.png")
    questions = [
        {"id": "q1", "image": "p.png", "conversations": [
            {"from": "human",
             "value": "<image>\nWhich is heavier?\nA. rock\nB. feather"}]},
        {"id": "q2", "conversations": [
            {"from": "human", "value": "What is 2+2?\nA. 3\nB. 4"}]},
    ]
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps(questions))

    seen = []

    class _Agent:
        def caption(self, image, question):
            seen.append((image is not None, question))
            return "The answer is A."

    out = tmp_path / "ans.jsonl"
    n = run_science_qa(_Agent(), str(qfile), str(img_dir), str(out))
    assert n == 2
    recs = [json.loads(l) for l in open(out)]
    assert recs[0]["question_id"] == "q1"
    # image question got the image; text-only one ran with image=None
    assert seen[0][0] is True and seen[1][0] is False
    # single-letter instruction appended, <image> stripped from the prompt
    assert seen[0][1].endswith("choices directly.")
    assert "<image>" not in seen[0][1]
    assert recs[0]["prompt"].startswith("<image>\n")


def test_review_bench_mode():
    def backend(content, system, max_tokens):
        # the bench context must be the caption string, no bbox block
        assert "[Context]\na photo of a dog\n\n[Question]" in content
        return "8 6\nok"

    qs = [{"question_id": i, "text": f"q{i}", "category": "conv",
           "image": "im.jpg"} for i in range(3)]
    a1 = [{"question_id": i, "text": "a"} for i in range(3)]   # no answer_id
    a2 = [{"question_id": i, "answer_id": f"y{i}", "text": "b"}
          for i in range(3)]
    ctx = {"im.jpg": {"image": "im.jpg", "caption": "a photo of a dog"}}

    # positional resume: first record already reviewed
    recs = list(review_answers(qs, a1, a2, backend, DEFAULT_RULES, ctx,
                               bench_mode=True, skip_first=1))
    assert len(recs) == 2
    assert recs[0]["category"] == "llava_bench_conv"
    # answer1_id falls back to the question_id (bench convention)
    assert recs[0]["answer1_id"] == 1

    # list-form caption joins with newlines
    assert format_bench_context({"caption": ["l1", "l2"]}) == "l1\nl2"

    # unknown category is a hard error in bench mode
    qs_bad = [{"question_id": 0, "text": "q", "category": "nope",
               "image": "im.jpg"}]
    with pytest.raises(KeyError):
        list(review_answers(qs_bad, a1[:1], a2[:1], backend, DEFAULT_RULES,
                            ctx, bench_mode=True))


def test_qa_baseline_generation():
    def backend(content, system, max_tokens):
        if content == "boom":
            raise RuntimeError("api down")
        return f"ans:{content}"

    out = generate_qa_baseline({2: "two", 1: "one", 3: "boom"}, backend,
                               max_workers=2)
    assert [a["question_id"] for a in out] == [1, 2, 3]   # sorted
    assert out[0]["text"] == "ans:one"
    assert out[2]["text"] == "#ERROR#"                     # retried, failed


def test_drivers_cli_smoke(tmp_path, capsys):
    from faithdiff_tpu.eval.drivers import main

    # pope CLI end-to-end over one category dir
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    with open(ann_dir / "coco_pope_popular.json", "w") as f:
        f.write(json.dumps({"label": "yes"}) + "\n")
        f.write(json.dumps({"label": "no"}) + "\n")
    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question_id": 0, "category": "popular"}) + "\n")
        f.write(json.dumps({"question_id": 1, "category": "popular"}) + "\n")
    rfile = tmp_path / "r.jsonl"
    with open(rfile, "w") as f:
        f.write(json.dumps({"question_id": 0, "text": "Yes."}) + "\n")
        f.write(json.dumps({"question_id": 1, "text": "No."}) + "\n")
    rc = main(["pope", "--annotation-dir", str(ann_dir),
               "--question-file", str(qfile), "--result-file", str(rfile)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Category: popular, # samples: 2" in out
    assert "Accuracy: 1.0" in out
