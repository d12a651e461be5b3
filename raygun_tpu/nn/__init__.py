from .layers import (
    ConvNd, ConvTransposeNd, InstanceNorm, BatchNorm, NoiseBlock,
    ParameterizedNoiseBlock, center_crop, crop_to_factor, get_activation,
    make_norm, max_pool_nd, interpolate, nearest_upsample, instance_norm,
)
from .unet import (
    ConvPass, ConvDownsample, MaxDownsample, Upsample, UNet, ResidualUNet,
    FusedUpConvPass, PackedConvPass, PackedHead, packed_level0_active,
)
from .streamed import make_streamed_mtlsd_forward, make_streamed_unet_forward
from .resnet import ResNet, ResnetBlock, resnet_valid_output_shape
from .discriminator import NLayerDiscriminator, NLayerDiscriminator2D, NLayerDiscriminator3D
from .utils import init_weights, param_count, probe_output_shape, valid_context
from .pallas import Downsample, blur_pool_xla, blur_pool_2d_pallas
