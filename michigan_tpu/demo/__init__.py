from michigan_tpu.demo.engine import DemoEngine, stroke_to_orient
