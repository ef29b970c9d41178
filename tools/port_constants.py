"""Mechanically extract HLL++ empirical constants from the reference.

Parses ``/root/reference/src/hyper_const.erl`` (threshold/1,
estimate_data/1, bias_data/1 — the raw empirical interpolation data
published with the HyperLogLog++ paper, Heule et al. 2013, appendix) into
``hyper_spark/kernel/hll_constants.json``.

This is data, not code: the numbers originate from the public HLL++ paper
appendix; the reference embeds them verbatim (hyper_const.erl:4-1118) and
estimate parity requires the identical tables.

Run once:  python tools/port_constants.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

SRC = Path("/root/reference/src/hyper_const.erl")
DST = Path(__file__).resolve().parent.parent / "hyper_spark" / "kernel" / "hll_constants.json"


def parse(text: str) -> dict:
    thresholds: dict[str, float] = {}
    for m in re.finditer(r"threshold\((\d+)\)\s*->\s*([0-9.eE+-]+)", text):
        thresholds[m.group(1)] = float(m.group(2))

    def parse_tuples(fname: str) -> dict[str, list[float]]:
        out: dict[str, list[float]] = {}
        for m in re.finditer(
            rf"{fname}\((\d+)\)\s*->\s*\{{(.*?)\}}[;.]", text, re.DOTALL
        ):
            p = m.group(1)
            nums = [float(x) for x in re.split(r"\s*,\s*", m.group(2).strip()) if x]
            out[p] = nums
        return out

    est = parse_tuples("estimate_data")
    bias = parse_tuples("bias_data")
    assert set(est) == set(bias), (sorted(est), sorted(bias))
    for p in est:
        assert len(est[p]) == len(bias[p]), (p, len(est[p]), len(bias[p]))
    assert set(thresholds) == {str(p) for p in range(4, 17)}
    return {"threshold": thresholds, "estimate_data": est, "bias_data": bias}


if __name__ == "__main__":
    data = parse(SRC.read_text())
    DST.write_text(json.dumps(data))
    sizes = {p: len(v) for p, v in sorted(data["estimate_data"].items(), key=lambda kv: int(kv[0]))}
    print(f"wrote {DST} ({DST.stat().st_size} bytes); vector lengths: {sizes}")
