"""Histogram / summarize sample-snapshot npz files.

The reference's paper studies post-process their streamed sample
snapshots with per-study plotting scripts (e.g. hodgkin-huxley/
plot_histograms.py, navier_stokes/plot_histograms.py -- latex + xrandr
specific).  This is the framework-generic equivalent for the snapshot
files bluest_tpu writes when ``params["samplefile"]`` is set (same npz
layout as the reference's blue_fn stream, blue_fn.py:133-145): one file
per sampled group, keys ``values_<output>_<pos>`` / ``inputs_<pos>``
plus ``models`` / ``n_samples`` / ``n_outputs`` metadata.

Usage:

    python tools/plot_snapshots.py SNAPFILE [SNAPFILE ...] \
        [--outputs 0 2] [--bins 60] [--out hists.png]

With --out (or no display) the figure is written to a png; without
matplotlib the summary table still prints.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_snapshot(path: str) -> dict:
    d = np.load(path, allow_pickle=True)
    models = [int(m) for m in np.asarray(d["models"][0])]
    No = int(np.asarray(d["n_outputs"]).ravel()[0])
    n = int(np.asarray(d["n_samples"]).ravel()[0])
    cols = {}
    for key in d.files:
        if key.startswith("values_"):
            _, out_n, pos = key.split("_")
            cols[(int(out_n), int(pos))] = np.asarray(d[key], dtype=float)
    return {"models": models, "n_outputs": No, "n_samples": n,
            "values": cols, "path": path}


def summarize(snap: dict, stream=sys.stdout) -> None:
    print("%s: group %s, %d samples, %d outputs"
          % (snap["path"], snap["models"], snap["n_samples"],
             snap["n_outputs"]), file=stream)
    for (n, pos), v in sorted(snap["values"].items()):
        v = v.reshape(v.shape[0], -1)[:, 0]
        print("  output %d model %d:  mean %.6g  std %.6g  (n=%d)"
              % (n, snap["models"][pos], float(np.mean(v)),
                 float(np.std(v)), v.shape[0]), file=stream)


def plot(snaps, outputs=None, bins: int = 60, out: str | None = None):
    import matplotlib
    if out is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    No = max(s["n_outputs"] for s in snaps)
    outputs = list(range(No)) if outputs is None else list(outputs)
    fig, axes = plt.subplots(1, len(outputs), squeeze=False,
                             figsize=(6 * len(outputs), 4.5))
    for ax, n in zip(axes[0], outputs):
        for s in snaps:
            # highest-fidelity column of each group (position 0): the
            # histograms the reference studies draw are of model samples,
            # one series per sampled group
            v = s["values"].get((n, 0))
            if v is None:
                continue
            v = v.reshape(v.shape[0], -1)[:, 0]
            ax.hist(v, bins=bins, density=True, histtype="step",
                    label="group %s (model %d)"
                    % (s["models"], s["models"][0]))
        ax.set_title("output %d" % n)
        ax.legend(fontsize=8)
    fig.tight_layout()
    if out is not None:
        fig.savefig(out, dpi=120)
        print("wrote", out)
    else:
        plt.show()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("files", nargs="+", help="snapshot npz files")
    ap.add_argument("--outputs", type=int, nargs="*", default=None)
    ap.add_argument("--bins", type=int, default=60)
    ap.add_argument("--out", default=None, help="write png here")
    ap.add_argument("--no-plot", action="store_true",
                    help="summary table only")
    args = ap.parse_args(argv)
    snaps = [load_snapshot(f) for f in args.files]
    for s in snaps:
        summarize(s)
    if not args.no_plot:
        try:
            plot(snaps, outputs=args.outputs, bins=args.bins, out=args.out)
        except ImportError:
            print("matplotlib unavailable; summary only")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
