"""``python -m laplace_gnn_tpu.native.build`` — compile the native engine."""

from . import build

if __name__ == "__main__":
    print(build(verbose=True))
