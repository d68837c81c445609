"""Validate the chained-dispatch steps/s probe against single-dispatch
gold runs (the headline bunny number's credibility check).

Four measurements on the SAME bunny hierarchy, one session:

  chained8_c500  - probe = 3 rounds x 8 chained 500-epoch chunks
  chained16_c500 - same with 16 chunks (scaling check: the rate must
                   NOT grow with probe length; if it does, the timing
                   is absorbing round trips, not measuring them)
  single_c2000   - scan_chunk=2000: the probe dispatches ONE jit call
                   containing a 2000-epoch lax.scan - a single-dispatch
                   gold run with exactly one forcing readback
  single again   - repeatability

All rates use the strict-lower-bound convention (raw wall including
one readback round trip; best of 3 rounds - see train/loop.py
run_scan_loop). Recorded 2026-08-17 on the tunneled v5e: chained8
5323, chained16 5444, single 5050 / 5022 steps/s - agreement within
8%, vs the per-chunk-median convention's 1436-1640 (whose 500-epoch
chunks were ~70% relay round-trip time). An earlier baseline-
subtraction variant of the probe was REJECTED with this script's
predecessor: under relay congestion the subtracted round trip is
seconds-scale noise and overstated the rate severalfold (observed
"5046" vs a same-minute single-dispatch "475").

    python scripts/validate_throughput_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    from bench import bunny_hierarchy
    from eigenpinns_tpu.configs import Config
    from eigenpinns_tpu.solvers.multigrid import MultigridTrainer

    h = bunny_hierarchy()   # same cached hierarchy the headline uses
    base = dict(n_modes=10, hierarchy=[128, 512, 1024],
                hidden_layers=[256] * 6, epochs=2000,
                corrector_scale=10.0, weight_residual=1000.0,
                weight_orthogonal=10.0, log_every=0,
                early_stop_patience=10**9, plateau_patience=2000,
                polish_iters=0)
    for label, chunk, tchunks in [("chained8_c500", 500, 8),
                                  ("chained16_c500", 500, 16),
                                  ("single_c2000", 2000, 1),
                                  ("single_c2000_again", 2000, 1)]:
        cfg = Config(**base, scan_chunk=chunk, timing_chunks=tchunks)
        t0 = time.time()
        r = MultigridTrainer(cfg).train(h)
        print(f"{label}: probe {r.steady_steps_per_sec:.1f} steps/s "
              f"({tchunks * chunk} epochs/round), "
              f"total wall {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
