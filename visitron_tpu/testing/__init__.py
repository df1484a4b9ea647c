from visitron_tpu.testing.synthetic import SyntheticWorld

__all__ = ["SyntheticWorld"]
