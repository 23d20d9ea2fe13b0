/* TEST-ONLY minimal libacars type shim for the compiled demod oracle. */
#ifndef _FAKE_LIBACARS_H
#define _FAKE_LIBACARS_H
#include <stdbool.h>
#include <stddef.h>
typedef struct la_proto_node la_proto_node;
typedef struct la_type_descriptor la_type_descriptor;
typedef enum { LA_MSG_DIR_UNKNOWN, LA_MSG_DIR_GND2AIR,
               LA_MSG_DIR_AIR2GND } la_msg_dir;
void la_proto_tree_destroy(la_proto_node *root);
#endif
