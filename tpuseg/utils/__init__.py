from tpuseg.utils.logging import Logger

__all__ = ["Logger"]
