from .torch_interop import (load_torch_file, save_torch_file,
                            state_dict_to_numpy,
                            vae_hmm_params_from_state_dict,
                            vae_hmm_params_to_state_dict)
