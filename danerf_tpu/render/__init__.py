from danerf_tpu.render.renderer import render_rays, render_frame

__all__ = ["render_rays", "render_frame"]
