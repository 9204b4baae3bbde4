from .proposal_io import (
    load_proposal_file,
    process_proposal_list,
    parse_directory,
    dump_window_list,
)
