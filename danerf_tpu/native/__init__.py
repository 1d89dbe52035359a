from danerf_tpu.native.bridge import ShaderBridge, ensure_built

__all__ = ["ShaderBridge", "ensure_built"]
