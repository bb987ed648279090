"""Interactive serving surfaces (the reference's browser demo, TPU-native)."""

from pope_tpu.serve.web_demo import WebDemo, make_demo_server, run_demo_server

__all__ = ["WebDemo", "make_demo_server", "run_demo_server"]
