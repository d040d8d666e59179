"""The measured-dispatch contract, checked against the recorded sweep.

fastpath._MEASURED_DISPATCH must agree with the per-geometry sweep
artifact (experiments/results/r4_geometry_sweep.jsonl, >=5 trials/row,
median + IQR): at every swept geometry the dispatched variant must be at
least as fast as the XLA floor (within one IQR), and within one IQR of
the fastest measured variant. This is the 'auto never picks a path
measured slower than XLA' guarantee (VERDICT r2 weak 3 / item 3) kept in
sync with the data that justifies it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from speaker_recognition_tpu.api import fastpath  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.realpath(__file__))),
                   "experiments", "results", "r4_geometry_sweep.jsonl")
FLOOR_ART = os.path.join(os.path.dirname(ART), "r3_scoring_scale.jsonl")


def _load():
    rows = [json.loads(l) for l in open(ART)]
    by_geom = {}
    for r in rows:
        if "variant" in r:
            by_geom.setdefault(r["geometry"], {})[r["variant"]] = r
    return by_geom


def _measured_dispatch_floor() -> float:
    """Median of the recorded per-program dispatch-floor measurements
    (r3_scoring_scale.jsonl 'dispatch_floor' rows: the wall of an empty
    jitted program through the tunnel). ADVICE r4: the small-batch
    exemption below must track this measured constant, not a hardcoded
    1.5e-3, so the guard tightens if dispatch overhead drops."""
    import statistics
    rows = [json.loads(l) for l in open(FLOOR_ART)]
    floors = [r["seconds"] for r in rows if r.get("phase") == "dispatch_floor"]
    assert floors, f"no dispatch_floor rows in {FLOOR_ART}"
    return statistics.median(floors)


def test_dispatch_beats_floor_at_every_swept_geometry():
    by_geom = _load()
    assert by_geom, f"sweep artifact missing/empty: {ART}"
    floor_name = "_".join(fastpath._FLOOR_VARIANT)
    # geometry -> the FeatureConfig deviation the sweep used (None = base)
    from speaker_recognition_tpu.config import FeatureConfig
    base = FeatureConfig()
    deltas_cfg = FeatureConfig(mfcc=base.mfcc, lpc=base.lpc,
                               use_lpc=True, n_deltas=2)
    GEOM_CFG = {
        "headline": base,
        "ubm_bank": base,
        "mfcc_only": FeatureConfig(mfcc=base.mfcc, use_lpc=False),
        "deltas": deltas_cfg,
        "nonbucket_len": base,
        "small_batch": base,
        # r4: previously-inferred rows, batch-size crossover points, and
        # the wide-kernel frames-per-call crossover (VERDICT r3 item 4)
        "large_bank_deltas": deltas_cfg,
        "nonbucket_large_bank": base,
        "nonbucket_large_bank_deltas": deltas_cfg,
        "batch_16": base,
        "batch_32": base,
        "batch_64": base,
        "batch_128": base,
        "batch_2048": base,
        "batch_4096": base,
    }
    for geom, variants in by_geom.items():
        cfg = GEOM_CFG.get(geom)
        if cfg is None:
            continue
        any_row = next(iter(variants.values()))
        chosen = fastpath.default_variant(
            8000, cfg, any_row["padded"], False,
            n_speakers=any_row["S"], n_mixtures=any_row["K"],
            batch_size=any_row["B"])
        chosen_name = "_".join(chosen)
        assert chosen_name in variants, (geom, chosen_name,
                                         sorted(variants))
        ch, fl = variants[chosen_name], variants.get(floor_name)
        if fl is not None:
            slack = max(ch["iqr_seconds"], fl["iqr_seconds"])
            assert ch["seconds_per_batch"] <= \
                fl["seconds_per_batch"] + slack, (
                    geom, chosen_name, ch["seconds_per_batch"],
                    fl["seconds_per_batch"])
        # and within one IQR of the fastest measured variant — EXCEPT in
        # the dispatch-floor regime: programs whose best variant runs
        # under 1.5x the MEASURED per-program tunnel floor
        # (r3_scoring_scale.jsonl dispatch_floor rows, ~1.1 ms) rank by
        # floor noise, not kernel merit (r4 sweep: the B=16/32/64 winner
        # flips between adjacent batch sizes with spreads larger than any
        # cross-variant gap), so there only the not-slower-than-floor
        # bound above is meaningful.
        best = min(variants.values(), key=lambda r: r["seconds_per_batch"])
        if best["seconds_per_batch"] < 1.5 * _measured_dispatch_floor():
            continue
        slack = max(ch["iqr_seconds"], best["iqr_seconds"])
        assert ch["seconds_per_batch"] <= \
            best["seconds_per_batch"] + slack, (
                geom, chosen_name, best["variant"])


def test_sweep_rows_are_multitrial():
    by_geom = _load()
    for geom, variants in by_geom.items():
        for r in variants.values():
            assert r.get("n_trials", 0) >= 5, (geom, r["variant"])
            assert "iqr_seconds" in r
