from .torch_interop import (head_params_from_state_dict,
                            improved_head_params_from_state_dict,
                            improved_head_params_to_state_dict,
                            load_torch_file,
                            regime_head_params_from_state_dict,
                            regime_head_params_to_state_dict,
                            save_torch_file, state_dict_to_numpy,
                            vae_hmm_params_from_state_dict,
                            vae_hmm_params_to_state_dict)
