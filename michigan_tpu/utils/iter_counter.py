"""Epoch/iteration bookkeeping with resume (reference util/iter_counter.py)."""

from __future__ import annotations

import os
import time

import numpy as np


class IterationCounter:
    def __init__(self, opt, dataset_size: int):
        self.opt = opt
        self.dataset_size = dataset_size
        self.first_epoch = 1
        self.total_epochs = opt.niter + opt.niter_decay
        self.epoch_iter = 0
        self.iter_record_path = os.path.join(
            opt.checkpoints_dir, opt.name, "iter.txt"
        )
        if opt.isTrain and opt.continue_train:
            try:
                self.first_epoch, self.epoch_iter = np.loadtxt(
                    self.iter_record_path, delimiter=",", dtype=int
                )
                print(
                    f"Resuming from epoch {self.first_epoch} "
                    f"at iteration {self.epoch_iter}"
                )
            except Exception:
                print(
                    f"Could not load iteration record at {self.iter_record_path}."
                    " Starting from beginning."
                )
        self.total_steps_so_far = (
            (self.first_epoch - 1) * dataset_size + self.epoch_iter
        )
        self.time_per_iter = 0.0
        self.last_iter_time = time.time()
        self.epoch_start_time = time.time()

    def training_epochs(self):
        return range(self.first_epoch, self.total_epochs + 1)

    def record_epoch_start(self, epoch: int):
        self.epoch_start_time = time.time()
        self.epoch_iter = 0
        self.last_iter_time = time.time()
        self.current_epoch = epoch

    def record_one_iteration(self):
        now = time.time()
        self.time_per_iter = (now - self.last_iter_time) / self.opt.batchSize
        self.last_iter_time = now
        self.total_steps_so_far += self.opt.batchSize
        self.epoch_iter += self.opt.batchSize

    def record_epoch_end(self):
        t = time.time() - self.epoch_start_time
        print(
            f"End of epoch {self.current_epoch} / {self.total_epochs} \t"
            f" Time Taken: {t:.0f} sec"
        )

    def record_current_iter(self):
        os.makedirs(os.path.dirname(self.iter_record_path), exist_ok=True)
        np.savetxt(
            self.iter_record_path,
            (self.current_epoch, self.epoch_iter),
            delimiter=",", fmt="%d",
        )

    def _trigger(self, freq: int) -> bool:
        return freq > 0 and (self.total_steps_so_far % freq) < self.opt.batchSize

    def needs_printing(self) -> bool:
        return self._trigger(self.opt.print_freq)

    def needs_displaying(self) -> bool:
        return self._trigger(self.opt.display_freq)

    def needs_saving(self) -> bool:
        return self._trigger(self.opt.save_latest_freq)


class IterationCounterMS(IterationCounter):
    """Variant persisting total_steps_so_far for progressive/multiscale
    training (reference util/iter_counter_ms.py:12-73)."""

    def record_current_iter(self):
        os.makedirs(os.path.dirname(self.iter_record_path), exist_ok=True)
        np.savetxt(
            self.iter_record_path,
            (self.current_epoch, self.epoch_iter, self.total_steps_so_far),
            delimiter=",", fmt="%d",
        )

    def _load_record(self):
        self.first_epoch, self.epoch_iter, self.total_steps_so_far = np.loadtxt(
            self.iter_record_path, delimiter=",", dtype=int
        )
