"""Observability utilities: visualizer logs + iteration counter triggers."""

import json
import os

import numpy as np

from michigan_tpu.config import Options
from michigan_tpu.utils.iter_counter import IterationCounter
from michigan_tpu.utils.visualizer import Visualizer
from michigan_tpu.utils.imaging import tensor2im, crop_feat_pad


def test_visualizer_logs(tmp_path):
    opt = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="viz",
                  no_html=False, display_winsize=64, label_nc=2).finalize()
    viz = Visualizer(opt)
    losses = {"GAN": np.float32(0.5), "rgb": np.float32(1.25)}
    viz.print_current_errors(1, 4, losses, 0.1)
    viz.plot_current_errors(losses, step=4)
    log = open(os.path.join(tmp_path, "viz", "loss_log.txt")).read()
    assert "GAN: 0.500" in log and "rgb: 1.250" in log
    rec = json.loads(open(os.path.join(tmp_path, "viz", "scalars.jsonl")).read())
    assert rec == {"step": 4, "GAN": 0.5, "rgb": 1.25}

    visuals = {
        "synthesized_image": np.zeros((8, 8, 3), np.float32),
        "input_tag": np.ones((8, 8, 1), np.float32),
    }
    viz.display_current_results(visuals, epoch=1, step=4)
    index = os.path.join(tmp_path, "viz", "web", "index.html")
    assert os.path.exists(index)

    # displaying at a later epoch lists only epochs whose images exist —
    # no broken <img> links for epochs that never hit a display step
    viz.display_current_results(visuals, epoch=4, step=64)
    html = open(index).read()
    assert "epoch004" in html and "epoch001" in html
    assert "epoch002" not in html and "epoch003" not in html


def test_visualizer_tf_log(tmp_path):
    """--tf_log writes real TensorBoard event files (scalars + images),
    like the reference's TF-1 writer (util/visualizer.py:24-28,47-65)."""
    opt = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="tb",
                  no_html=True, display_winsize=64, label_nc=2,
                  tf_log=True).finalize()
    viz = Visualizer(opt)
    viz.plot_current_errors({"GAN": np.float32(0.5)}, step=1)
    viz.display_current_results(
        {"synthesized_image": np.zeros((8, 8, 3), np.float32)},
        epoch=1, step=1,
    )
    viz.tf_writer.close()
    logs = os.path.join(tmp_path, "tb", "logs")
    events = [f for f in os.listdir(logs) if "tfevents" in f]
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(os.path.join(logs, events[0])) > 0
    # no_html: nothing was written to web/
    assert not os.path.exists(os.path.join(tmp_path, "tb", "web", "index.html"))


def test_iteration_counter_triggers_and_resume(tmp_path):
    opt = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="ic",
                  batchSize=4, niter=2, niter_decay=1, print_freq=8,
                  display_freq=16, save_latest_freq=16).finalize()
    ic = IterationCounter(opt, dataset_size=16)
    assert list(ic.training_epochs()) == [1, 2, 3]
    ic.record_epoch_start(1)
    prints = 0
    for _ in range(4):
        ic.record_one_iteration()
        if ic.needs_printing():
            prints += 1
    assert prints == 2  # every 8 images at batch 4
    ic.record_current_iter()
    # resume path
    opt2 = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="ic",
                   batchSize=4, niter=2, niter_decay=1,
                   continue_train=True).finalize()
    ic2 = IterationCounter(opt2, dataset_size=16)
    assert ic2.first_epoch == 1 and ic2.epoch_iter == 16
    # the 3-column record restores the exact total, not a reconstruction
    assert ic2.total_steps_so_far == 16


def test_iteration_counter_unpair_resume(tmp_path):
    """--unpairTrain epochs run TWO dataset passes (train.py run_epoch is
    called for dataloader2 then dataloader), so resume must not reconstruct
    total_steps_so_far as (epoch-1)*dataset_size.  Covers both the exact
    3-column restore and the legacy 2-column fallback."""
    opt = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="up",
                  batchSize=4, niter=2, niter_decay=0,
                  unpairTrain=True).finalize()
    ic = IterationCounter(opt, dataset_size=16)
    ic.record_epoch_start(1)
    for _ in range(8):  # two full 16-image passes at batch 4
        ic.record_one_iteration()
    assert ic.total_steps_so_far == 32
    ic.current_epoch = 2
    ic.epoch_iter = 0
    ic.record_current_iter()

    opt2 = Options(isTrain=True, checkpoints_dir=str(tmp_path), name="up",
                   batchSize=4, niter=2, niter_decay=0, unpairTrain=True,
                   continue_train=True).finalize()
    ic2 = IterationCounter(opt2, dataset_size=16)
    assert ic2.total_steps_so_far == 32  # exact value from iter.txt

    # legacy 2-column file (reference format): unpair-aware reconstruction
    with open(ic.iter_record_path, "w") as f:
        f.write("2\n0\n")
    ic3 = IterationCounter(opt2, dataset_size=16)
    assert ic3.total_steps_so_far == 32  # (2-1) * 2*16, not (2-1)*16


def test_imaging_helpers():
    x = np.zeros((4, 4, 3), np.float32)
    img = tensor2im(x)
    assert img.dtype == np.uint8 and img[0, 0, 0] == 127
    padded = np.pad(np.ones((4, 4, 3)), ((2, 2), (2, 2), (0, 0)))
    assert crop_feat_pad(padded, 4, 4).shape == (4, 4, 3)


def test_labelcolormap_matches_reference():
    """Palette parity vs the reference implementation (util/util.py:293-328)
    for the generic bit-twiddle, the 35-class Cityscapes table, and the
    COCO-182 important-color overrides."""
    import numpy as np

    from michigan_tpu.utils.colormap import labelcolormap

    def ref_labelcolormap(N):
        def uint82bin(n, count=8):
            return "".join(str((n >> y) & 1) for y in range(count - 1, -1, -1))

        cmap = np.zeros((N, 3), dtype=np.uint8)
        for i in range(N):
            r = g = b = 0
            id_ = i + 1
            for j in range(7):
                s = uint82bin(id_)
                r = r ^ (np.uint8(s[-1]) << (7 - j))
                g = g ^ (np.uint8(s[-2]) << (7 - j))
                b = b ^ (np.uint8(s[-3]) << (7 - j))
                id_ = id_ >> 3
            cmap[i] = (r, g, b)
        return cmap

    for n in (2, 20, 150, 182):
        ours = labelcolormap(n)
        ref = ref_labelcolormap(n)
        if n == 182:
            for i, c in {105: (170, 170, 170), 123: (29, 195, 49),
                         154: (54, 62, 167), 156: (95, 219, 255),
                         168: (140, 104, 47)}.items():
                ref[i] = c
        np.testing.assert_array_equal(ours, ref)

    cs = labelcolormap(35)
    assert (cs[:5] == 0).all()           # five leading unlabeled entries
    assert tuple(cs[5]) == (111, 74, 0)  # then the Cityscapes palette
    assert tuple(cs[34]) == (0, 0, 142)


def test_coco_id2label_matches_reference():
    """Full-vocabulary oracle vs reference util/coco.py (the table the
    182-class palette overrides key off)."""
    from tests.reference_oracle import import_reference

    import_reference()
    from util import coco as ref_coco

    from michigan_tpu.utils.coco import COCO_STUFF_NAMES, id2label

    assert len(COCO_STUFF_NAMES) == 183
    for raw in list(range(183)) + [300, -1 + 183]:
        assert id2label(raw) == ref_coco.id2label(raw), raw
