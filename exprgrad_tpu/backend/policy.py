"""Cost-model routing of user schedules: Pallas custom kernel vs XLA.

The reference decides *whether to parallelize* a kernel from estimated work
(estimateWork, passes.nim:2338-2400) and then always honors the schedule in
its GPU codegen.  On TPU the trade-off is different: XLA's own lowering of
contractions/elementwise chains is already MXU/VPU-optimal for most shapes,
while a hand-scheduled Pallas kernel pays a custom-call launch and forgoes
XLA fusion with its neighbors.  So schedules are treated as *routed hints*:

* ``schedule_mode="auto"`` (default): a scheduled kernel goes to the Pallas
  emitter only when this cost model predicts a win; otherwise it falls back
  to the XLA path with a ``ScheduleWarning`` and a ``schedule-fallback``
  entry in ``lowering_stats`` — never a silent 100x regression.
* ``schedule_mode="force"``: always honor the schedule when the emitter
  supports the kernel shape (benchmarking / kernel development).
* ``schedule_mode="ignore"``: never emit Pallas; schedules only influence
  nothing (useful to A/B the XLA path).

The model's constants are MEASURED, not guessed: scripts/pallas_calibrate.py
runs both paths on the real chip and writes ``pallas_calibration.json`` next
to this module; until a calibration exists the defaults are the most recent
committed on-chip measurements — the round-4 driver bench (BENCH_r04.json /
BENCH_DETAILS.json), per-constant provenance on each default below.
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass

from ..errors import ScheduleWarning

_MODES = ("auto", "force", "ignore")

# Latest committed on-chip measurements (round-4 driver bench,
# BENCH_DETAILS.json — entry named per constant); overridden by
# pallas_calibration.json when scripts/pallas_calibrate.py has run.
_DEFAULTS = {
    # sustained rates through the compiled executor, per path
    # matmul8192_f32_default median (145.75 TFLOP/s, spread ±0.1%)
    "xla_matmul_tflops": 145.8,
    # matmul4096_scheduled_pallas median (18.97 TFLOP/s at chain=4 —
    # RTT-dominated, so a LOWER BOUND on the kernel-body rate; the
    # conservative direction for routing: Pallas is only chosen when it
    # wins even at this pessimistic rate)
    "pallas_matmul_tflops": 19.0,
    # softmax8192_rowchain_fused xla_gbps: effective chain-bytes/s of
    # XLA's per-kernel softmax lowering at 8192^2 f32 (107.9 GB/s) —
    # the bandwidth-bound regime these decisions are about
    "xla_elementwise_gbps": 108.0,
    # no isolated single-map Pallas measurement exists yet; assuming
    # parity with XLA's rate means the launch overhead alone decides
    # (XLA wins unless work_bytes says otherwise) — conservative
    "pallas_elementwise_gbps": 108.0,
    # fused row-chain kernels (softmax/norm families): sustained GB/s of
    # the ONE-kernel form; softmax8192_rowchain_fused fused_gbps median
    # (143.8 GB/s = 1.33x the per-kernel XLA path on chip)
    "pallas_rowchain_gbps": 143.8,
    # attention rates at the bench shape, both sides measured end-to-end
    # (attention_b8_h4_s2048_d128_causal: flash median 6.80, XLA median
    # 7.20 TFLOP/s — the generic pallas_matmul rate is NOT
    # representative of flash, and composing the XLA side from
    # matmul+elementwise constants mispredicts it)
    "flash_attention_tflops": 6.8,
    "xla_attention_tflops": 7.2,
    # per-pallas_call launch overhead through this platform's
    # custom-call path: scripts/pallas_overhead.py has never gotten a
    # chip window (VERDICT r4 weak #2), so this one is still the
    # round-1 order-of-magnitude estimate
    "pallas_launch_us": 1000.0,
}

_CALIBRATION_PATH = os.path.join(
    os.path.dirname(__file__), "pallas_calibration.json"
)


def _load_constants() -> dict:
    constants = dict(_DEFAULTS)
    try:
        with open(_CALIBRATION_PATH) as f:
            data = json.load(f)
        constants.update(
            {k: float(v) for k, v in data.items() if k in _DEFAULTS}
        )
        constants["calibrated"] = True
    except (OSError, ValueError):
        constants["calibrated"] = False
    return constants


@dataclass
class Decision:
    use_pallas: bool
    reason: str


class SchedulePolicy:
    """Routing decisions + fallback reporting for one compiled model."""

    def __init__(self, mode: str = "auto") -> None:
        if mode not in _MODES:
            raise ValueError(
                f"schedule_mode must be one of {_MODES}, got {mode!r}"
            )
        self.mode = mode
        self.constants = _load_constants()

    # -- decisions -------------------------------------------------------
    def contraction(self, m: int, n: int, k: int) -> Decision:
        """Scheduled matmul-family kernel: Pallas tiled kernel vs XLA dot.

        Epilogue fusion does not change this decision: XLA fuses the
        elementwise consumer into its dot inside the one-jit target too,
        so neither side is credited the consumer's bytes.
        """
        if self.mode == "force":
            return Decision(True, "schedule_mode=force")
        if self.mode == "ignore":
            return Decision(False, "schedule_mode=ignore")
        c = self.constants
        flops = 2.0 * m * n * k
        xla_s = flops / (c["xla_matmul_tflops"] * 1e12)
        pallas_s = (
            c["pallas_launch_us"] * 1e-6
            + flops / (c["pallas_matmul_tflops"] * 1e12)
        )
        if pallas_s < xla_s:
            return Decision(
                True,
                f"cost model: pallas {pallas_s * 1e6:.0f}us < xla "
                f"{xla_s * 1e6:.0f}us",
            )
        return Decision(
            False,
            f"cost model: xla dot {xla_s * 1e6:.0f}us <= pallas "
            f"{pallas_s * 1e6:.0f}us"
            + ("" if c["calibrated"] else " (uncalibrated defaults)"),
        )

    def mapreduce(self, total_bytes: int, work_bytes: int = 0) -> Decision:
        """Scheduled elementwise/reduction kernel: Pallas vs XLA fusion.

        Both paths are HBM-bound; XLA additionally fuses the kernel with
        its neighbors inside the one-jit target, which the custom call
        forecloses, so Pallas must win on bandwidth alone.

        ``work_bytes`` charges in-kernel element touches beyond the HBM
        traffic — computed-index kernels select from V candidates per
        loop position (the compare-reduce gather/scatter touches V
        values; the one-hot form does V MACs), so their Pallas cost
        scales with loop_space x V even though the HBM bytes do not.
        XLA's native gather/scatter stays roughly bandwidth-bound, so
        the charge applies to the Pallas side only (conservative)."""
        if self.mode == "force":
            return Decision(True, "schedule_mode=force")
        if self.mode == "ignore":
            return Decision(False, "schedule_mode=ignore")
        c = self.constants
        xla_s = total_bytes / (c["xla_elementwise_gbps"] * 1e9)
        pallas_s = (
            c["pallas_launch_us"] * 1e-6
            + (total_bytes + work_bytes)
            / (c["pallas_elementwise_gbps"] * 1e9)
        )
        if pallas_s < xla_s:
            return Decision(True, "cost model: pallas bandwidth win")
        return Decision(
            False,
            "cost model: XLA fusion path wins for elementwise/reduction"
            + ("" if c["calibrated"] else " (uncalibrated defaults)"),
        )

    def rowchain(
        self, operand_bytes: int, out_bytes: int, n_members: int
    ) -> Decision:
        """Fused row-chain kernel vs per-kernel XLA lowering.

        XLA cannot carry VMEM-resident intermediates across reduction
        boundaries, so the per-kernel path re-reads the chain's operands
        roughly once per member (softmax: 3 passes over the input); the
        fused kernel reads them once and pays one launch."""
        if self.mode == "force":
            return Decision(True, "schedule_mode=force")
        if self.mode == "ignore":
            return Decision(False, "schedule_mode=ignore")
        c = self.constants
        xla_s = (operand_bytes * n_members + out_bytes) / (
            c["xla_elementwise_gbps"] * 1e9
        )
        pallas_s = c["pallas_launch_us"] * 1e-6 + (
            operand_bytes + out_bytes
        ) / (c["pallas_rowchain_gbps"] * 1e9)
        if pallas_s < xla_s:
            return Decision(
                True,
                f"cost model: fused chain {pallas_s * 1e6:.0f}us < "
                f"{n_members}-kernel XLA {xla_s * 1e6:.0f}us",
            )
        return Decision(
            False,
            "cost model: XLA per-kernel path wins for this chain"
            + ("" if c["calibrated"] else " (uncalibrated defaults)"),
        )

    def attention(
        self, b: int, h: int, sq: int, skv: int, d: int, itemsize: int = 4
    ) -> Decision:
        """Fused flash-attention (Pallas) vs plain-XLA attention.

        XLA attention materializes the [sq, skv] weight matrix in HBM
        (costing ~4 full passes over it across softmax fwd: write scores,
        read+write probs, read for the PV matmul); flash never does, but
        pays custom-call launches and the measured Pallas compute rate.
        Independent of schedule_mode: ``force``/``ignore`` apply to
        schedule *hints*, while the attention impl is an explicit layer
        argument with its own "flash"/"xla" overrides.

        When the weight matrix alone would exceed ~2 GB, flash is chosen
        regardless — the XLA path would OOM or page catastrophically.

        Both sides are DIRECTLY measured end-to-end rates at the bench
        shape (``xla_attention_tflops`` / ``flash_attention_tflops``) —
        composing the XLA side from the matmul + elementwise constants
        mispredicts it badly (the measured per-kernel bandwidth rate is
        RTT-inflated at these sizes; r4 chip data: XLA attention 7.2 vs
        flash 6.8 TFLOP/s, i.e. XLA wins at the bench shape).
        """
        c = self.constants
        flops = 4.0 * b * h * sq * skv * d
        s2_bytes = 4.0 * b * h * sq * skv  # scores kept f32
        if s2_bytes > 2e9:
            return Decision(True, "weight matrix too large for HBM path")
        xla_s = flops / (c["xla_attention_tflops"] * 1e12)
        pallas_s = (
            c["pallas_launch_us"] * 1e-6
            + flops / (c["flash_attention_tflops"] * 1e12)
        )
        if pallas_s < xla_s:
            return Decision(
                True,
                f"cost model: flash {pallas_s * 1e6:.0f}us < xla "
                f"{xla_s * 1e6:.0f}us",
            )
        return Decision(
            False,
            f"cost model: xla attention {xla_s * 1e6:.0f}us <= flash "
            f"{pallas_s * 1e6:.0f}us"
            + ("" if c["calibrated"] else " (uncalibrated defaults)"),
        )

    # -- reporting ---------------------------------------------------------
    def fallback(
        self,
        stats: dict | None,
        kernel_desc: str,
        reason: str,
        kind: str = "schedule-fallback",
    ) -> None:
        """Record + warn that a schedule fell back to the XLA path."""
        if stats is not None:
            stats[kind] = stats.get(kind, 0) + 1
        warnings.warn(
            f"schedule on {kernel_desc} not routed to Pallas: {reason}; "
            "using the XLA lowering (compile with schedule_mode='force' "
            "to override, 'ignore' to silence)",
            ScheduleWarning,
            stacklevel=2,
        )
