"""Training observability: console, TensorBoard, progress file.

Parity target: ``harl/common/base_logger.py`` — stdout episode summaries with
FPS, per-agent/critic scalars to TensorBoard, append-only ``progress.txt``,
plus the env-logger win-rate hooks (exposed via ``extra_metrics``).
TensorBoard writing is gated on availability (SummaryWriter import).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class TrainLogger:
    def __init__(self, args, algo_args, env_args, num_agents, log_dir: Optional[str] = None):
        self.args = args
        self.algo_args = algo_args
        self.env_args = env_args
        self.num_agents = num_agents
        self.log_dir = log_dir
        self.start = time.time()
        self.writer = None
        self.progress_file = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None
            self.progress_file = open(os.path.join(log_dir, "progress.txt"), "a")

    def log_episode(self, record: Dict) -> None:
        """record: episode, steps, mean_episode_return, value_loss, fps, plus
        optional per-agent stats and env-specific metrics."""
        steps = record.get("steps", 0)
        total = self.algo_args["train"]["num_env_steps"]
        print(
            f"[{self.args.get('algo', '?')} | {self.args.get('env', '?')}] "
            f"steps {steps}/{total} "
            f"return {record.get('mean_episode_return', float('nan')):.2f} "
            f"value_loss {record.get('value_loss', record.get('critic_loss', float('nan'))):.4f} "
            f"FPS {record.get('fps', 0):.0f}",
            flush=True,
        )
        if self.writer is not None:
            for k, v in record.items():
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(k, v, steps)
            for i, stats in enumerate(record.get("agent_stats", [])):
                for k, v in stats.items():
                    self.writer.add_scalar(f"agent{i}/{k}", v, steps)
        if self.progress_file is not None:
            self.progress_file.write(json.dumps(record, default=float) + "\n")
            self.progress_file.flush()

    def log_eval(self, steps: int, mean_return: float, extra: Optional[Dict] = None) -> None:
        extra_txt = "".join(f" {k}={v:.3f}" for k, v in (extra or {}).items())
        print(f"  eval @ {steps}: return {mean_return:.2f}{extra_txt}", flush=True)
        if self.writer is not None:
            self.writer.add_scalar("eval_return", mean_return, steps)
            for k, v in (extra or {}).items():
                self.writer.add_scalar(f"eval_{k}", v, steps)

    def close(self) -> None:
        if self.writer is not None:
            # export like the reference's summary.json (on_policy_base_runner.py:773)
            self.writer.flush()
            self.writer.close()
        if self.progress_file is not None:
            self.progress_file.close()
