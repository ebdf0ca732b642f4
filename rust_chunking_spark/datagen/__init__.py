from .corpus import (  # noqa: F401
    expected_final_state,
    extract_text,
    generate_pages_df,
    generate_wal,
    make_html,
    page_record,
)
