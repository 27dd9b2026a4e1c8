"""Show matching-line runs between a repo test file and reference tests.

Usage: python tools/testsim.py tests/test_foo.py [min_run]
Prints the best-matching reference file, the similarity, and every
contiguous run of matching normalized lines of length >= min_run.
"""
import glob
import re
import sys


def normalize(line):
    line = line.split('#')[0].strip()
    return re.sub(r'\s+', ' ', line)


def subst_lines(path):
    out = []
    for i, raw in enumerate(open(path), start=1):
        n = normalize(raw)
        if n and len(n) > 3:
            out.append((i, n))
    return out


def best_reference(path):
    mine = subst_lines(path)
    A = set(n for _, n in mine)
    best = (0.0, None)
    for f in glob.glob('/root/reference/tests/**/*.py', recursive=True):
        B = set(n for _, n in subst_lines(f))
        s = len(A & B) / max(1, len(A))
        if s > best[0]:
            best = (s, f)
    return best, mine


def main():
    path = sys.argv[1]
    min_run = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    (sim, ref), mine = best_reference(path)
    print(f'{path}: sim={sim:.2f} vs {ref}')
    B = set(n for _, n in subst_lines(ref))
    run = []
    runs = []
    for lineno, n in mine:
        if n in B:
            run.append((lineno, n))
        else:
            if len(run) >= min_run:
                runs.append(run)
            run = []
    if len(run) >= min_run:
        runs.append(run)
    for run in runs:
        print(f'--- run of {len(run)} (lines {run[0][0]}..{run[-1][0]}) ---')
        for lineno, n in run:
            print(f'  {lineno:4d} {n}')


if __name__ == '__main__':
    main()
