from nerf_or_nothing_tpu.models import mipnerf, mlp
