"""Benchmark scorer tests."""
from faithdiff_tpu.eval.scorers import (mmbench_accuracy,
                                        parse_multiple_choice, pope_metrics,
                                        science_qa_accuracy, textvqa_accuracy,
                                        vqa_accuracy)


def test_parse_multiple_choice():
    assert parse_multiple_choice("The answer is B.") == "B"
    assert parse_multiple_choice("A. because of gravity") == "A"
    assert parse_multiple_choice("(C)") == "C"
    assert parse_multiple_choice("D") == "D"
    assert parse_multiple_choice("I am not sure") is None


def test_science_qa_accuracy():
    acc = science_qa_accuracy(
        ["The answer is A.", "B.", "The answer is C.", "nonsense"],
        ["A", "B", "D", "A"])
    assert abs(acc - 0.5) < 1e-9


def test_pope_metrics():
    m = pope_metrics(
        ["Yes, it is", "no", "Yes", "No, there is not"],
        ["yes", "no", "no", "yes"])
    assert m["accuracy"] == 0.5
    assert m["precision"] == 0.5
    assert m["recall"] == 0.5
    assert abs(m["yes_ratio"] - 0.5) < 1e-9


def test_vqa_accuracy_soft_voting():
    gts = ["two", "two", "2", "two", "three"]
    # "two" matches 3 of the humans (string-normalised) -> full credit
    assert vqa_accuracy("Two.", gts) == 1.0
    assert vqa_accuracy("three", gts) == 1.0 / 3.0
    assert vqa_accuracy("four", gts) == 0.0


def test_textvqa_accuracy():
    acc = textvqa_accuracy(
        ["a cat", "blue"],
        [["a cat", "cat", "the cat"], ["red", "red", "red"]])
    assert 0.0 < acc < 1.0


def test_mmbench_text_fallback():
    acc = mmbench_accuracy(
        ["The answer is A.", "a red apple"],
        ["A", "B"],
        options_per_q=[{"A": "x"}, {"A": "a banana", "B": "a red apple"}])
    assert acc == 1.0
