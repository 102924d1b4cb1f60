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
        self.total_steps_so_far = None
        if opt.isTrain and opt.continue_train:
            try:
                self._load_record()
                print(
                    f"Resuming from epoch {self.first_epoch} "
                    f"at iteration {self.epoch_iter}"
                )
            except Exception:
                print(
                    f"Could not load iteration record at {self.iter_record_path}."
                    " Starting from beginning."
                )
        if self.total_steps_so_far is None:
            self.total_steps_so_far = (
                (self.first_epoch - 1) * self._steps_per_epoch() + self.epoch_iter
            )
        self.time_per_iter = 0.0
        self.last_iter_time = time.time()
        self.epoch_start_time = time.time()

    def _steps_per_epoch(self) -> int:
        """Image-steps per epoch: --unpairTrain epochs run two passes
        (dataloader2 then dataloader — train.py run_epoch), so legacy
        2-column iter.txt reconstruction must count both."""
        two_pass = getattr(self.opt, "unpairTrain", False)
        return self.dataset_size * (2 if two_pass else 1)

    def _load_record(self):
        """Read iter.txt: 3-column (epoch, epoch_iter, total_steps) written
        by this class, or the legacy/reference 2-column format
        (util/iter_counter.py:24-33) with total_steps reconstructed."""
        rec = np.atleast_1d(
            np.loadtxt(self.iter_record_path, delimiter=",", dtype=int)
        )
        self.first_epoch, self.epoch_iter = int(rec[0]), int(rec[1])
        if rec.size >= 3:
            self.total_steps_so_far = int(rec[2])

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
            (self.current_epoch, self.epoch_iter, self.total_steps_so_far),
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
    training (reference util/iter_counter_ms.py:12-73).  The base class now
    persists/restores the 3-column record itself, so this is an alias kept
    for API parity."""
