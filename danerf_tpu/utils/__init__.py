from danerf_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]
