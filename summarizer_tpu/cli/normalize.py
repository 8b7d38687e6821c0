"""CLI for eccv16 -> summarizer h5 normalization (see data/normalize.py)."""

from __future__ import annotations

import argparse

from summarizer_tpu.data.normalize import normalize_summe, normalize_tvsum


def main(argv=None):
    p = argparse.ArgumentParser("Normalize upstream eccv16 datasets")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tvsum")
    t.add_argument("--eccv-h5", required=True)
    t.add_argument("--out-h5", required=True)
    t.add_argument("--mat", required=True, help="ydata-tvsum50.mat")
    t.add_argument("--info-tsv", required=True, help="ydata-tvsum50-info.tsv")

    s = sub.add_parser("summe")
    s.add_argument("--eccv-h5", required=True)
    s.add_argument("--out-h5", required=True)

    args = p.parse_args(argv)
    if args.cmd == "tvsum":
        normalize_tvsum(args.eccv_h5, args.out_h5, args.mat, args.info_tsv)
        print("TVSum done.")
    else:
        normalize_summe(args.eccv_h5, args.out_h5)
        print("SumMe done.")


if __name__ == "__main__":
    main()
