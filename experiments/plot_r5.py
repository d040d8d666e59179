#!/usr/bin/env python3
"""Render the r5 figures from the committed jsonl artifacts.

Figures (static PDF, matplotlib):
  r5_nperson.pdf      accuracy vs speaker count, reading + whisper 5 s
                      curves with per-seed min-max bands, against the
                      reference's published points/bands
                      (nperson-mix-1523-t5.log, -whisper.log)
  r5_attribution.pdf  density curve D(n) (one 40-trained bank, restricted
                      argmax) vs the true curve A(n) — the bank-size
                      isolation figure
  r5_conversation.pdf streaming accuracy timeline (when the artifact has
                      timeline rows)

Colors are the first slots of the validated default categorical palette
(dataviz skill references/palette.md: slots 1-2 pass every adjacent-pair
gate; identity is never color-alone — series carry direct labels).
"""

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.realpath(__file__))
RES = os.path.join(HERE, "results")

BLUE = "#2a78d6"     # series 1 (reading)
ORANGE = "#eb6834"   # series 2 (whisper)
INK = "#0b0b0b"
MUTED = "#52514e"
BAND = "#b9b7b0"     # neutral reference band


def rows(path):
    out = []
    with open(os.path.join(RES, path)) as f:
        for line in f:
            r = json.loads(line)
            if r.get("kind") != "artifact_header":
                out.append(r)
    return out


def nperson_figure():
    data = rows("r5_accuracy_ubm.jsonl")
    fig, ax = plt.subplots(figsize=(7, 4.6))
    for label, corpus, color in (("reading", "ubm_v7_80_reading", BLUE),
                                 ("whisper", "ubm_v7_80_whisper", ORANGE)):
        pts = sorted((r["n_speakers"], r) for r in data
                     if r.get("kind") == "nperson_curve"
                     and r["corpus"] == corpus and r["test_seconds"] == 5.0)
        if not pts:
            continue
        xs = [n for n, _ in pts]
        ys = [r["accuracy_mean"] for _, r in pts]
        lo = [r["accuracy_min"] for _, r in pts]
        hi = [r["accuracy_max"] for _, r in pts]
        ax.fill_between(xs, lo, hi, color=color, alpha=0.12, linewidth=0)
        ax.plot(xs, ys, "-o", color=color, linewidth=2, markersize=5)
        ax.annotate(label, xy=(xs[-1], ys[-1]), xytext=(6, 0),
                    textcoords="offset points", color=INK, fontsize=10,
                    va="center")
    # the reference's published anchors (BASELINE.md)
    ax.plot([4], [0.995], "s", color=MUTED, markersize=6)
    ax.fill_between([38, 42], 0.952, 0.968, color=BAND, alpha=0.7,
                    linewidth=0)
    ax.fill_between([78, 82], 0.945, 0.9525, color=BAND, alpha=0.7,
                    linewidth=0)
    ax.plot([80], [0.944], "D", color=MUTED, markersize=6)
    ax.annotate("reference (reading)", xy=(40, 0.968), xytext=(0, 6),
                textcoords="offset points", color=MUTED, fontsize=9,
                ha="center")
    ax.annotate("ref whisper", xy=(80, 0.944), xytext=(-4, -14),
                textcoords="offset points", color=MUTED, fontsize=9,
                ha="right")
    ax.set_xlabel("enrolled speakers", color=INK)
    ax.set_ylabel("closed-set accuracy (5 s tests)", color=INK)
    ax.set_xticks([4, 10, 20, 40, 80])
    ax.set_ylim(0.80, 1.005)
    ax.grid(True, alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.set_title("Anchored-corpus curves vs the reference's published "
                 "points (10 seeds, min-max bands)", fontsize=10,
                 color=INK)
    fig.tight_layout()
    out = os.path.join(RES, "r5_nperson.pdf")
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)


def attribution_figure():
    att = rows("r5_nperson_attribution.jsonl")
    acc = rows("r5_accuracy_ubm.jsonl")
    fig, ax = plt.subplots(figsize=(6, 4.2))
    A = sorted((r["n_speakers"], r["accuracy_mean"]) for r in acc
               if r.get("kind") == "nperson_curve"
               and r["corpus"] == "ubm_v7_80_reading"
               and r["test_seconds"] == 5.0 and r["n_speakers"] <= 40)
    D = sorted((r["n_sub"], r["accuracy_mean"]) for r in att
               if r.get("kind") == "density_curve")
    full = [r for r in att if r.get("kind") == "full_bank"]
    if full:
        D.append((40, full[0]["accuracy_mean"]))
    ax.plot([n for n, _ in A], [a for _, a in A], "-o", color=BLUE,
            linewidth=2, markersize=5)
    ax.annotate("A(n): bank trained at n", xy=A[2], xytext=(12, 12),
                textcoords="offset points", color=INK, fontsize=10)
    ax.plot([n for n, _ in D], [a for _, a in D], "--s", color=ORANGE,
            linewidth=2, markersize=5)
    ax.annotate("D(n): 40-trained bank,\nrestricted argmax", xy=D[0],
                xytext=(22, -4), textcoords="offset points", color=INK,
                fontsize=10, va="top")
    ax.set_xlabel("competitor count n", color=INK)
    ax.set_ylabel("accuracy (5 s tests)", color=INK)
    ax.set_xticks([4, 10, 20, 40])
    ax.grid(True, alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.set_title("Bank-size isolation: D(n) ≈ A(n)\n"
                 "→ the 40-speaker drop is competitor density",
                 fontsize=10, color=INK)
    fig.tight_layout()
    out = os.path.join(RES, "r5_attribution.pdf")
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)


def jfa_structure_figure():
    """JFA vs MAP on the correlated-identity corpus (r5_identity_structure):
    accuracy vs eigenvoice rank at clean / 6 dB channel mismatch, nu=16+d,
    with MAP baselines and the i.i.d.-corpus best cell as the control."""
    path = os.path.join(RES, "r5_identity_structure.jsonl")
    if not os.path.exists(path):
        return
    data = rows("r5_identity_structure.jsonl")
    cells = [r for r in data if r.get("kind") == "jfa_cell"
             and r.get("nu") == 16
             and r["corpus"] in ("ubm_v8_structured_r8",
                                 "ubm_v8_structured_r8_guarded")]
    # the seed-1/nv-8 divergence is superseded by the guarded re-run rows
    cells = [r for r in cells
             if not (r["corpus"] == "ubm_v8_structured_r8"
                     and r["channel_db"] == 6.0 and r["nv"] == 8)]
    maps = [r for r in data if r.get("kind") == "map_baseline"
            and r["corpus"] == "ubm_v8_structured_r8"]
    if not cells or not maps:
        return

    def curve(ch):
        pts = {}
        for r in cells:
            if r["channel_db"] == ch:
                pts.setdefault(r["nv"], []).append(r["acc_jfa"])
        return sorted((nv, sum(v) / len(v)) for nv, v in pts.items())

    fig, (ax, axr) = plt.subplots(
        1, 2, figsize=(9.2, 4.4), gridspec_kw={"width_ratios": [2.1, 1]})
    for ch, color, label in ((0.0, BLUE, "JFA, clean"),
                             (6.0, ORANGE, "JFA, 6 dB mismatch")):
        pts = curve(ch)
        ax.plot([n for n, _ in pts], [a for _, a in pts], "-o",
                color=color, linewidth=2, markersize=5)
        ax.annotate(label, xy=pts[-1], xytext=(6, 0),
                    textcoords="offset points", color=INK, fontsize=10,
                    va="center")
        m = [r["acc_map"] for r in maps if r["channel_db"] == ch]
        mv = sum(m) / len(m)
        ax.axhline(mv, color=color, linestyle=":", linewidth=1.4, alpha=0.8)
        ax.annotate(f"MAP, {'clean' if ch == 0 else '6 dB'} ({mv:.3f})",
                    xy=(4, mv), xytext=(2, 4), textcoords="offset points",
                    color=MUTED, fontsize=9)
    # control: the i.i.d.-identity corpus's best 6 dB JFA cell (nv=50+d)
    try:
        iid = [r for r in rows("r5_jfa_channel.jsonl")
               if r.get("kind") == "jfa_cell" and r.get("train_d")
               and r["channel_db"] == 6.0]
    except FileNotFoundError:
        iid = []
    if iid:
        by_cell = {}
        for r in iid:
            by_cell.setdefault((r["nv"], r["nu"]), []).append(r["acc_jfa"])
        (bnv, _bnu), accs = max(by_cell.items(),
                                key=lambda kv: sum(kv[1]) / len(kv[1]))
        best = sum(accs) / len(accs)
        ax.plot([bnv], [best], "x", color=MUTED, markersize=9,
                markeredgewidth=2)
        ax.annotate(f"i.i.d.-identity corpus best (nv={bnv}+d)",
                    xy=(bnv, best), xytext=(-10, 8),
                    textcoords="offset points", color=MUTED, fontsize=9,
                    ha="right")
    ax.set_xlabel("eigenvoice rank nv (nu=16, +d)", color=INK)
    ax.set_ylabel("closed-set accuracy (20 speakers)", color=INK)
    ax.set_xscale("log", base=2)
    ax.set_xticks([4, 8, 16, 32, 50])
    ax.set_xticklabels(["4", "8", "16", "32", "50"])
    ax.grid(True, alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.set_title("Correlated (rank-8) speaker identity: JFA beats MAP\n"
                 "under channel mismatch, as published", fontsize=10,
                 color=INK)

    # dose-response panel: best JFA-minus-MAP 6 dB margin vs rho
    def margin(cell_rows):
        by = {}
        for r in cell_rows:
            by.setdefault((r["nv"], r["nu"]), []).append(
                r["acc_jfa"] - r["acc_map"])
        return max((sum(v) / len(v) for v in by.values()), default=None)

    pts_rho = [(0.0, margin(iid)),
               (0.4, margin([r for r in data if r.get("kind") == "jfa_cell"
                             and r["corpus"] == "ubm_v8_structured_r8_rho04"
                             and r["channel_db"] == 6.0])),
               (0.75, margin([r for r in cells if r["channel_db"] == 6.0]))]
    pts_rho = [(x, y) for x, y in pts_rho if y is not None]
    rhos = [x for x, _ in pts_rho]
    margins = [y for _, y in pts_rho]
    axr.axhline(0, color=MUTED, linewidth=0.9)
    axr.plot(rhos, margins, "-o", color=INK, linewidth=1.8, markersize=5)
    for x, y in zip(rhos, margins):
        axr.annotate(f"{y:+.2f}", xy=(x, y), xytext=(0, 7),
                     textcoords="offset points", color=INK, fontsize=9,
                     ha="center")
    axr.annotate("MAP wins", xy=(0.72, -0.02), color=MUTED, fontsize=9,
                 ha="right", va="top")
    axr.annotate("JFA wins", xy=(0.72, 0.02), color=MUTED, fontsize=9,
                 ha="right", va="bottom")
    axr.set_xticks(rhos)
    axr.set_xlabel("identity correlation ρ", color=INK)
    axr.set_ylabel("best JFA − MAP accuracy, 6 dB", color=INK)
    axr.set_ylim(-0.13, 0.24)
    axr.grid(True, alpha=0.25, linewidth=0.5)
    axr.spines[["top", "right"]].set_visible(False)
    axr.set_title("Dose-response: the margin flips\nsign with any ρ > 0",
                  fontsize=10, color=INK)
    fig.tight_layout()
    out = os.path.join(RES, "r5_identity_structure.pdf")
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)


def conversation_figure():
    path = os.path.join(RES, "r5_conversation.jsonl")
    if not os.path.exists(path):
        return
    data = rows("r5_conversation.jsonl")
    convs = [r for r in data if r.get("kind") == "conversation"]
    if not convs:
        return
    fig, ax = plt.subplots(figsize=(6.6, 4.2))
    cats = ["raw\nall", "shown\nall", "raw\nsteady", "shown\nsteady",
            "raw\ntransition", "shown\ntransition"]
    keys = ["acc_raw_all", "acc_shown_all", "acc_raw_steady",
            "acc_shown_steady", "acc_raw_transition", "acc_shown_transition"]
    import numpy as np
    vals = np.asarray([[c[k] for k in keys] for c in convs], float)
    mean = vals.mean(axis=0)
    x = np.arange(len(cats))
    colors = [BLUE, ORANGE] * 3
    bars = ax.bar(x, mean, width=0.62, color=colors)
    for xi, m in zip(x, mean):
        ax.annotate(f"{m:.2f}", xy=(xi, m), xytext=(0, 3),
                    textcoords="offset points", ha="center", fontsize=9,
                    color=INK)
    for c in convs:  # per-seed dots
        ax.plot(x, [c[k] for k in keys], "o", color=INK, markersize=3,
                alpha=0.45)
    ax.set_xticks(x, cats, fontsize=9)
    ax.set_ylabel("per-tick accuracy", color=INK)
    ax.set_ylim(0, 1.05)
    ax.grid(True, axis="y", alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.set_title("Conversation mode: raw vs one-step-smoothed accuracy\n"
                 "(ticks split by turn boundaries; dots = seeds)",
                 fontsize=10, color=INK)
    fig.tight_layout()
    out = os.path.join(RES, "r5_conversation.pdf")
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)


if __name__ == "__main__":
    nperson_figure()
    attribution_figure()
    jfa_structure_figure()
    conversation_figure()
