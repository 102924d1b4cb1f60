"""PyQt5 painting UI (reference demo.py Ex widget + ui/ package).

Import-gated: only loaded when PyQt5 exists.  Provides the same interactive
capabilities as the reference UI (ui/ui4.py layout, ui/mouse_event.py
stroke capture): open target/reference images, paint hair/background mask
edits and orientation strokes, run edits through DemoEngine, save results.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

from PyQt5.QtCore import Qt
from PyQt5.QtGui import QImage, QPen, QPixmap
from PyQt5.QtWidgets import (
    QApplication,
    QFileDialog,
    QGraphicsScene,
    QGraphicsView,
    QHBoxLayout,
    QLabel,
    QPushButton,
    QVBoxLayout,
    QWidget,
)

from michigan_tpu.demo.engine import (
    DemoEngine,
    dilate_hole,
    select_tag_image,
    stroke_to_orient,
)

MODE_BG, MODE_HAIR, MODE_STROKE = 0, 1, 2


class PaintScene(QGraphicsScene):
    """Stroke capture with per-mode history (reference ui/mouse_event.py)."""

    def __init__(self, parent=None):
        super().__init__(parent)
        self.mode = MODE_HAIR
        self.size = 6
        self.strokes = {MODE_BG: [], MODE_HAIR: [], MODE_STROKE: []}
        self._current = None

    def mousePressEvent(self, event):
        self._current = [event.scenePos()]

    def mouseMoveEvent(self, event):
        if self._current is None:
            return
        self._current.append(event.scenePos())
        pen = QPen(
            Qt.green if self.mode == MODE_STROKE
            else (Qt.white if self.mode == MODE_HAIR else Qt.black)
        )
        pen.setWidth(self.size)
        self.addLine(
            self._current[-2].x(), self._current[-2].y(),
            self._current[-1].x(), self._current[-1].y(), pen,
        )

    def mouseReleaseEvent(self, event):
        if self._current:
            self.strokes[self.mode].append((list(self._current), self.size))
        self._current = None

    def undo(self):
        if self.strokes[self.mode]:
            self.strokes[self.mode].pop()

    def rasterize(self, shape):
        """Strokes -> binary masks per mode (reference demo.py:431-435)."""
        import cv2

        masks = {}
        for mode, strokes in self.strokes.items():
            m = np.zeros(shape, np.uint8)
            for pts, size in strokes:
                for a, b in zip(pts[:-1], pts[1:]):
                    cv2.line(
                        m, (int(a.x()), int(a.y())), (int(b.x()), int(b.y())),
                        1, size,
                    )
            masks[mode] = m
        return masks


BRUSH_SIZES = (2, 6, 12, 24, 48)  # reference ui/mouse_event.py stroke widths


class DemoWindow(QWidget):
    """Five-view layout mirroring the reference ui/ui4.py: paintable tag
    mask, inpainted-orientation view, result view, plus tag/ref thumbnails;
    per-mode brush sizes and undo (ui/mouse_event.py)."""

    def __init__(self, opt):
        super().__init__()
        self.opt = opt
        # precompile both inpaint modes so the FIRST user edit already hits
        # the steady-state latency (23.5 ms device-side on v5e — README)
        self.engine = DemoEngine(opt, precompile=True)
        self.tag_name = None
        self.ref_name = None
        self.setWindowTitle("MichiGAN-TPU demo")

        # five views (ui4.py:8-248): mask paint scene + orient + result
        # scenes, tag/ref thumbnails
        self.scene = PaintScene()
        self.view = QGraphicsView(self.scene)
        self.orient_scene = QGraphicsScene()
        self.orient_view = QGraphicsView(self.orient_scene)
        self.result_label = QLabel("result")
        self.tag_thumb = QLabel("target")
        self.ref_thumb = QLabel("reference")

        buttons = [
            ("Open target", self.open_target),
            ("Open reference", self.open_reference),
            ("Paint hair", lambda: self.set_mode(MODE_HAIR)),
            ("Paint background", lambda: self.set_mode(MODE_BG)),
            ("Paint stroke", lambda: self.set_mode(MODE_STROKE)),
            ("Brush +", lambda: self.step_brush(+1)),
            ("Brush -", lambda: self.step_brush(-1)),
            ("Undo", self.scene.undo),
            ("Edit", self.edit),
            ("Save", self.save),
        ]
        btn_col = QVBoxLayout()
        for name, cb in buttons:
            b = QPushButton(name)
            b.clicked.connect(cb)
            btn_col.addWidget(b)
        views = QVBoxLayout()
        views.addWidget(self.orient_view)
        views.addWidget(self.tag_thumb)
        views.addWidget(self.ref_thumb)
        lay = QHBoxLayout(self)
        lay.addWidget(self.view)
        lay.addLayout(views)
        lay.addLayout(btn_col)
        lay.addWidget(self.result_label)
        self.result = None
        self.orient_rgb = None

    def set_mode(self, mode):
        self.scene.mode = mode

    def step_brush(self, direction):
        """Cycle the active mode's brush through the reference widths."""
        sizes = list(BRUSH_SIZES)
        try:
            i = sizes.index(self.scene.size)
        except ValueError:
            i = min(range(len(sizes)), key=lambda j: abs(sizes[j] - self.scene.size))
        self.scene.size = sizes[max(0, min(len(sizes) - 1, i + direction))]

    def _load(self, title):
        path, _ = QFileDialog.getOpenFileName(self, title, self.opt.demo_data_dir)
        return os.path.splitext(os.path.basename(path))[0] if path else None

    def open_target(self):
        self.tag_name = self._load("target image")
        if self.tag_name:
            img_path = os.path.join(
                self.opt.demo_data_dir, "images", self.tag_name + ".jpg"
            )
            self.scene.clear()
            self.scene.addPixmap(QPixmap(img_path))
            self.tag_thumb.setPixmap(QPixmap(img_path))

    def open_reference(self):
        self.ref_name = self._load("reference image")
        if self.ref_name:
            self.ref_thumb.setPixmap(QPixmap(os.path.join(
                self.opt.demo_data_dir, "images", self.ref_name + ".jpg"
            )))

    def edit(self):
        if not (self.tag_name and self.ref_name):
            return
        d = self.opt.demo_data_dir
        tag_img = Image.open(os.path.join(d, "images", self.tag_name + ".jpg"))
        ref_img = Image.open(os.path.join(d, "images", self.ref_name + ".jpg"))
        tag_label = np.array(
            Image.open(os.path.join(d, "labels", self.tag_name + ".png"))
        )
        tag_orient = np.array(
            Image.open(
                os.path.join(d, "orients", self.tag_name + "_orient_dense.png")
            )
        )
        masks = self.scene.rasterize(tag_label.shape)
        label = np.clip(tag_label + masks[MODE_HAIR], 0, 1) * (1 - masks[MODE_BG])

        # edited mask that removes hair -> reconstructed tag supplies the
        # exposed background (reference demo.py:137-142, 330-333)
        recon_path = os.path.join(d, "images_recon", self.tag_name + ".jpg")
        recon = Image.open(recon_path) if os.path.exists(recon_path) else None
        tag_img = select_tag_image(tag_img, recon, tag_label, label)

        if masks[MODE_STROKE].any():
            stroke = masks[MODE_STROKE] * label
            hole = dilate_hole(stroke, 50) * label
            self.result, self.orient_rgb, _ = self.engine.edit(
                os.path.join(d, "labels", self.ref_name + ".png"),
                label, label * (1 - hole), tag_orient, ref_img, tag_img,
                orient_stroke=stroke_to_orient(stroke), mask_stroke=stroke,
                mask_hole=hole, inpaint_mode="stroke",
            )
        else:
            self.result, self.orient_rgb, _ = self.engine.edit(
                os.path.join(d, "labels", self.ref_name + ".png"),
                label, label, tag_orient, ref_img, tag_img, inpaint_mode="ref",
            )
        h, w, _ = self.result.shape
        qimg = QImage(self.result.tobytes(), w, h, 3 * w, QImage.Format_RGB888)
        self.result_label.setPixmap(QPixmap.fromImage(qimg))
        if self.orient_rgb is not None:
            # show the inpainted orientation like the reference's orient view
            orgb = np.ascontiguousarray(
                (np.clip(np.asarray(self.orient_rgb), 0, 1) * 255).astype(np.uint8)
            )
            oh, ow, _ = orgb.shape
            oimg = QImage(orgb.tobytes(), ow, oh, 3 * ow, QImage.Format_RGB888)
            self.orient_scene.clear()
            self.orient_scene.addPixmap(QPixmap.fromImage(oimg))

    def save(self):
        if self.result is not None:
            os.makedirs("./inference_samples", exist_ok=True)
            Image.fromarray(self.result).save("./inference_samples/demo_edit.jpg")


def launch(argv=None):
    from michigan_tpu.config import demo_options

    opt = demo_options(argv)
    app = QApplication(sys.argv)
    win = DemoWindow(opt)
    win.show()
    sys.exit(app.exec_())
