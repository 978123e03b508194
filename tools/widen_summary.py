#!/usr/bin/env python3
"""Round-11 third-decade widen summary: per-batch sf10 vs sf100
walls, decade ratios, movement, spill — feeds BASELINE round-11."""
import json, sys

BATCHES = ['wA_tpch', 'wB_rel', 'wC_text', 'wD_embmm', 'wE_audio', 'wF_drift']

def load(b, sf):
    w = json.load(open(f'tools/bench_r11_{b}_{sf}.json'))['queries']
    m = json.load(open(f'tools/bench_r11_{b}_{sf}_movement.json'))['queries']
    return w, m

def main():
    flag_ratio = float(sys.argv[1]) if len(sys.argv) > 1 else 14.0
    allq = []
    for b in BATCHES:
        try:
            w10, _ = load(b, 'sf10')
            w100, m100 = load(b, 'sf100')
        except FileNotFoundError:
            print(f'{b}: (pending)')
            continue
        tot10, tot100 = sum(w10.values()), sum(w100.values())
        sw = sum(v['shuffle_write_mb'] for v in m100.values())
        sp = sum(v['spilled_mb'] for v in m100.values())
        print(f'{b}: n={len(w100)} sf10={tot10:.0f}s sf100={tot100:.0f}s '
              f'x{tot100 / max(tot10, 0.1):.1f} shuffle={sw / 1000:.1f}GB spill={sp:.0f}MB')
        for q, v in w100.items():
            allq.append((q, w10.get(q), v, m100[q]['shuffle_write_mb'],
                         m100[q]['spilled_mb']))
    print(f'\nTOTAL queries with both decades this round: {len(allq)}')
    flagged = [x for x in allq
               if (x[1] and x[2] / x[1] > flag_ratio) or x[4] > 0]
    if flagged:
        print(f'\nflagged (>x{flag_ratio:.0f}/decade wall or any spill):')
        print(f"{'query':26}{'sf10':>8}{'sf100':>9}{'ratio':>7}{'shufMB':>9}{'spillMB':>9}")
        for q, a, b_, s, p in sorted(flagged, key=lambda x: -(x[2] / x[1] if x[1] else 0)):
            # a (sf10 wall) can be None for a spill-only flag measured
            # at sf100 alone — print '-' instead of crashing the table
            ar = f'{a:8.1f}' if a else f'{"-":>8}'
            rr = f'{b_ / a:7.1f}' if a else f'{"-":>7}'
            print(f'{q:26}{ar}{b_:9.1f}{rr}{s:9.1f}{p:9.1f}')
    else:
        print('no flags')

if __name__ == '__main__':
    main()
