"""Driver-contract consistency: the invariants the correctness harness
relies on but never states — every query has an oracle, the parked
tail is exactly the tail (so the 50-row driver cap lands on the
priority head), and the head holds the full reference-view surface.
Pure-Python (no Spark jobs): queries() only builds closures."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent


def test_every_query_is_oracled_and_vice_versa():
    q, o = ent.queries(), ent.oracle_sql()
    assert set(q) == set(o)


def test_parked_tail_is_exactly_the_tail():
    q = ent.queries()
    parked = ent._PARKED_TAIL
    assert len(set(parked)) == len(parked), "duplicate parked key"
    assert set(parked) <= set(q), "parked key not in queries()"
    assert list(q)[-len(parked):] == list(parked)


def test_priority_head_fits_driver_cap_and_holds_reference_views():
    q = ent.queries()
    head = list(q)[:50]
    assert len(q) - len(ent._PARKED_TAIL) <= 50, (
        "unparked keys exceed the measured 50-row driver correctness cap; "
        "park the most redundant new key (with a family comment)")
    for view_key in ent._VIEW_KEYS.values():
        assert view_key in head, f"{view_key} fell out of the priority head"
    for audited in ("knn_ivf", "knn_ivf_multiprobe", "dedup_clusters"):
        assert audited in head
    # rotation rule, generically: every key with NO driver-green
    # history must sit in the head for its first driver rows (the
    # verification loop closes the same round it opens). The r12-era
    # form of this test pinned the four keys ADDED in r12 by name;
    # they got their first driver-green rows in CORRECTNESS_r12.json,
    # so the r13 regeneration legitimately rotates them out in favor
    # of the stalest green keys.
    import glob
    import json
    import os

    seen: set[str] = set()
    for p in glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                    "CORRECTNESS_r*.json")):
        with open(p) as f:
            rows = json.load(f)
        rows = rows.get("rows", rows)
        for k, v in rows.items():
            if isinstance(v, dict) and v.get("rows_match") \
                    and v.get("schema_match") and v.get("hash_match"):
                seen.add(k)
    never_checked = [k for k in q if k not in seen]
    for k in never_checked:
        assert k in head, f"never-driver-checked key {k} parked"


def test_parked_tail_matches_head_cap_exactly():
    """r11 verdict task 5: the tail is GENERATED from the actual
    window (scripts/gen_parked_tail.py), so it must equal
    queries()[50:] exactly — every driver correctness slot is used
    (head == 50, not <= 50) and the regenerated bookkeeping can never
    drift from the observable contract again."""
    q = list(ent.queries())
    assert q[50:] == list(ent._PARKED_TAIL)
    assert len(q) - len(ent._PARKED_TAIL) == 50


def test_parked_tail_incap_citations_are_actually_incap():
    """Every parked-tail comment that justifies a parked key by naming
    an 'in-cap' family representative must name a key ACTUALLY inside
    the 50-row head — rotations kept silently invalidating these
    (r7 review found a circular pair and a dozen stale cites), and
    test_cited_names_resolve only checks existence, not cap status."""
    import re

    src = open("/root/repo/__spark_entry__.py", encoding="utf-8").read()
    region = src[src.index("_PARKED_TAIL = ("):]
    head = set(list(ent.queries())[:50])
    keys = set(ent.queries())
    cited = set()
    # "in-cap X", "in-cap: X", "in-cap rep is X", "in-cap via X",
    # spanning comment-line breaks (strip the comment prefix first)
    prose = re.sub(r"\n\s*#\s*", " ", region)
    for m in re.finditer(
            r"in-cap(?: row| rep| reps| analog| representative)?"
            r"(?: is| are|:| via)?\s+([a-z0-9_]+(?:\s*\+\s*[a-z0-9_]+)*)",
            prose):
        for tok in re.split(r"\s*\+\s*", m.group(1)):
            if tok in keys:
                cited.add(tok)
    stale = sorted(k for k in cited if k not in head)
    assert not stale, f"parked comments cite non-in-cap reps: {stale}"


def _comment_and_docstring_text(path):
    """(prose, code) split of a python file: prose is #-comments plus
    docstrings, code is everything else (incl. SQL string literals)."""
    import ast
    import io
    import tokenize

    src = open(path, encoding="utf-8").read()
    prose_spans = []
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type == tokenize.COMMENT:
            prose_spans.append(tok.string)
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return " ".join(prose_spans), src
    docstrings = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            d = ast.get_docstring(node, clean=False)
            if d:
                docstrings.append(d)
    prose = " ".join(prose_spans) + "\n" + "\n".join(docstrings)
    code = src
    for d in docstrings:
        code = code.replace(d, " ")
    for c in prose_spans:
        code = code.replace(c, " ")
    return prose, code


def test_cited_names_resolve():
    """Reference-integrity guard (VERDICT r5 #1): every queries()-key-
    shaped token and every ``test_*`` name cited in a source comment or
    docstring must name something that exists — a real queries() key,
    or a symbol/string that occurs in actual code somewhere in the
    repo. A claim of evidence that exists only in the comment citing
    it (the r4 phantom MinHash test, the r5 phantom
    events_disorder_audit_signal) fails here."""
    import glob
    import re

    keys = set(ent.queries())
    prefixes = sorted({k.split("_")[0] for k in keys})
    key_pat = re.compile(r"\b(?:%s)_[a-z0-9_]+\b" % "|".join(prefixes))
    test_pat = re.compile(r"\btest_[a-zA-Z0-9_]+\b")

    files = (glob.glob("/root/repo/aws_trusted_advisor_explorer_spark/**/*.py",
                       recursive=True)
             + ["/root/repo/__spark_entry__.py", "/root/repo/bench.py"]
             + glob.glob("/root/repo/scripts/*.py"))
    test_files = glob.glob("/root/repo/tests/*.py")

    cited = set()
    all_code = []
    for p in files:
        prose, code = _comment_and_docstring_text(p)
        cited |= set(key_pat.findall(prose)) | set(test_pat.findall(prose))
        all_code.append(code)
    for p in test_files:
        _, code = _comment_and_docstring_text(p)
        all_code.append(code)
        all_code.append(p)  # file path: "tests/test_streaming.py" cites resolve
    code_blob = "\n".join(all_code)

    unresolved = sorted(
        t for t in cited
        if t not in keys
        and not re.search(r"\b%s\b" % re.escape(t), code_blob))
    assert not unresolved, (
        "phantom references (cited in comments/docstrings but defined "
        f"nowhere in code, tests, or queries()): {unresolved}")
