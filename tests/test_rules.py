"""Unit tests for the vectorized scrub rules (reference semantics:
/root/reference/src/cur-prot/dollar_sign_replace.py,
fix_capitalized_dashes.py)."""

import pyarrow as pa

from scripts_ray import rules


def s(xs):
    return pa.array(xs, type=pa.string())


def test_dollar_starts_with():
    out = rules.repair_dollar_signs(s(["$ 4 om $ x", "no $ here"]))
    assert out[0].as_py() == "§ 4 om § x"
    assert out[1].as_py() == "no $ here"  # $ not at start, no shape match


def test_dollar_section_shape():
    out = rules.repair_dollar_signs(s(["8 14. hello", "8 1. x", "88 14. no"]))
    assert out[0].as_py() == "§ 14. hello"
    assert out[1].as_py() == "§ 1. x"
    assert out[2].as_py() == "88 14. no"


def test_dollar_num_shape():
    out = rules.repair_dollar_signs(s(["12 $ more $ text", "5$ x"]))
    assert out[0].as_py() == "12 § more $ text"  # only the matched prefix
    assert out[1].as_py() == "5§ x"


def test_soft_hyphen():
    out = rules.join_soft_hyphens(s(["hyphen­ated", "a ­ b", "x­ y"]))
    assert out.to_pylist() == ["hyphenated", "ab", "xy"]


def test_caps_dash():
    out = rules.join_caps_dashes(s(["ANDERS- SON sade", "AB- CD- EF", "ab- cd"]))
    assert out.to_pylist() == ["ANDERSSON sade", "ABCD- EF", "ab- cd"]


def test_whitespace():
    out = rules.normalize_whitespace(s(["  a \t b\n\nc  ", "x"]))
    assert out.to_pylist() == ["a b c", "x"]


def test_pii():
    out = rules.scrub_pii(
        s(["mail me at a.b+c@ex.com now", "ring +46 70 123 45 67 tack", "clean"])
    )
    assert out.to_pylist() == [
        "mail me at <EMAIL> now",
        "ring <PHONE> tack",
        "clean",
    ]


def test_full_chain_order():
    out = rules.scrub_text(s(["$ 1 och  x­ y  PER- SON a@b.se ok"]))
    assert out[0].as_py() == "§ 1 och xy PERSON <EMAIL> ok"
