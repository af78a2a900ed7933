"""TimeRFT data filter/sampler CLI (C9 parity: src/utils/process_data.py)."""

from __future__ import annotations

import argparse

from ..utils.curriculum import process_data_file


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_json")
    p.add_argument("-o", "--output_prefix", default="")
    p.add_argument("-t", "--task", default="", choices=["0070_all", "gaussian_03", "random_sample"])
    p.add_argument("-k", "--k_dynamic_total", default=2500, type=int)
    args = p.parse_args(argv)
    if not args.output_prefix:
        args.output_prefix = args.input_json[:-5]
    out = process_data_file(args.input_json, args.output_prefix, args.task, int(args.k_dynamic_total))
    print(f"save to: {out}")


if __name__ == "__main__":
    main()
