#!/usr/bin/env python
"""Regenerate ``__spark_entry__._PARKED_TAIL`` from the actual window
(r11 verdict task 5 — the tail is bookkeeping DERIVED from history,
never hand-edited).

Rotation rule (standing since r10): the 50-key head holds
(a) the pinned keys (reference views + the three audited-first ops,
    held in-head by tests/test_entry_contract.py),
(b) every key with NO driver-green history (operators added this
    round — the verification loop closes the same round it opens),
(c) the STALEST previously-green keys (oldest most-recent
    driver-green round, ties alphabetical) until the head is full.
Everything else parks, annotated with its full driver-green history
from the committed CORRECTNESS_r*.json artifacts, ordered freshest-
parked first.

Prints the generated tuple body; pass --write to splice it into
__spark_entry__.py in place. Run tests/test_entry_contract.py after.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_CAP = 50
AUDITED = ("knn_ivf", "knn_ivf_multiprobe", "dedup_clusters")


def green_history() -> dict[str, list[int]]:
    hist: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for k, v in json.load(open(f)).items():
            if (isinstance(v, dict) and v.get("rows_match")
                    and v.get("hash_match", True)):
                hist.setdefault(k, []).append(rnd)
    return hist


def ranges(rs: list[int]) -> str:
    rs = sorted(set(rs))
    out, s, e = [], rs[0], rs[0]
    for r in rs[1:]:
        if r == e + 1:
            e = r
        else:
            out.append((s, e))
            s = e = r
    out.append((s, e))
    return ",".join(f"r{a}" if a == b else f"r{a}-r{b}" for a, b in out)


def main() -> None:
    import __spark_entry__ as ent

    hist = green_history()
    q = list(ent.queries())
    pinned = set(ent._VIEW_KEYS.values()) | set(AUDITED)
    new = [k for k in q if k not in hist]
    others = sorted((k for k in q if k not in pinned and k not in new),
                    key=lambda k: (max(hist[k]), k))
    n_fill = HEAD_CAP - len(pinned) - len(new)
    assert n_fill >= 0, (
        f"{len(new)} new keys + {len(pinned)} pinned exceed the "
        f"{HEAD_CAP}-row cap — park some new keys by hand this round")
    head = pinned | set(new) | set(others[:n_fill])
    tail = sorted((k for k in q if k not in head),
                  key=lambda k: (-max(hist[k]), k))
    body = "\n".join(f'    "{k}",  # driver-green {ranges(hist[k])}'
                     for k in tail)
    if "--write" in sys.argv:
        path = os.path.join(REPO, "__spark_entry__.py")
        src = open(path).read()
        start = src.index("_PARKED_TAIL = (")
        end = src.index(")\n\n\ndef queries()", start) + 1
        open(path, "w").write(
            src[:start] + "_PARKED_TAIL = (\n" + body + "\n)" + src[end:])
        print(f"wrote {len(tail)} parked keys "
              f"(head {len(q) - len(tail)}/{HEAD_CAP})")
    else:
        print(body)


if __name__ == "__main__":
    main()
