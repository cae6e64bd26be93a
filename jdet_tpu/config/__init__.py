from .config import Config, init_cfg, get_cfg, update_cfg, save_cfg, print_cfg, load_cfg_file, merge_dict_b2a
from .constants import get_classes_by_name
