from .loader import BatchIterator
from .polymnist import PolyMNISTData, load_polymnist
from .celeba_hq import CelebAHQMaskData, load_celeba_hq, ATTR_VISIBLE
from .synthetic import synthetic_polymnist, synthetic_celeba
