"""Isolate the fuzz case that hangs a worker: re-run a (target, seed)
batch with a per-case SIGALRM watchdog, dump the offending input.

Usage: python scripts/fuzz_repro_hang.py TARGET SEED N [timeout_s]
"""
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.fuzz_soak import mutations  # noqa: E402


class CaseTimeout(Exception):
    pass


def _alarm(sig, frm):
    raise CaseTimeout()


def main():
    target, seed, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    per_case = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    rng = np.random.default_rng(seed)

    if target != "c_custom":
        raise SystemExit("only c_custom instrumented so far")

    from amv_tpu.bitstream.jpeg_parse import parse_jpeg
    from amv_tpu.codecs.mjpeg import encode_mjpeg_frames
    from amv_tpu.native import entropy_native as native
    y = rng.integers(0, 256, (1, 32, 32), np.uint8).astype(np.uint8)
    cb = rng.integers(0, 256, (1, 16, 16), np.uint8).astype(np.uint8)
    cr = rng.integers(0, 256, (1, 16, 16), np.uint8).astype(np.uint8)
    data = encode_mjpeg_frames(y, cb, cr, restart_interval=2)[0]

    signal.signal(signal.SIGALRM, _alarm)
    t_batch = time.time()
    for i, mut in enumerate(mutations(data, rng, n)):
        # one line per case: SIGALRM cannot interrupt a C call that never
        # returns to the interpreter, so a true C hang is identified by
        # the LAST index printed before the outer `timeout` kills us.
        print(f"case {i}  ({time.time() - t_batch:.1f}s)", flush=True)
        signal.alarm(per_case)
        t0 = time.time()
        try:
            f = parse_jpeg(mut)
            mcu_w = 16 if any(h > 1 or v > 1
                              for (_, h, v, _) in f.components) else 8
            n_mcu = (((f.width + mcu_w - 1) // mcu_w) *
                     ((f.height + mcu_w - 1) // mcu_w))
            if not 0 < n_mcu <= 4096:
                continue
            pairs = [(dc_id, ac_id)
                     for (_, dc_id, ac_id, _) in f.mcu_blocks()]
            native.decode_scans_custom(
                [f.scan], n_mcu, f.huff, pairs,
                restart_interval=f.restart_interval)
        except CaseTimeout:
            path = f"/tmp/hang_case_{target}_{seed}_{i}.bin"
            open(path, "wb").write(mut)
            print(f"HANG case {i} (> {per_case}s) dumped to {path}",
                  flush=True)
        except Exception:
            pass
        finally:
            signal.alarm(0)
        dt = time.time() - t0
        if dt > 2:
            path = f"/tmp/slow_case_{target}_{seed}_{i}.bin"
            open(path, "wb").write(mut)
            print(f"SLOW case {i}: {dt:.1f}s dumped to {path}", flush=True)
    print("batch done", flush=True)


if __name__ == "__main__":
    main()
