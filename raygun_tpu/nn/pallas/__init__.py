from .blur_pool import Downsample, blur_pool_xla, blur_pool_2d_pallas, binomial_kernel
