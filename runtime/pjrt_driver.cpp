// PJRT C-API host driver: execute a deployed SevenNet-TPU artifact from
// C++ with zero Python in the loop.
//
// This is the TPU-native replacement for the role libtorch plays in the
// reference's LAMMPS pair styles (pair_e3gnn.cpp:228 executes a
// TorchScript module per MD step; model + metadata are loaded in
// ::coeff, :293-385). Here the model is the `model_const.stablehlo`
// artifact produced by `sevenn_get_model` (scripts/deploy.py): a
// StableHLO program with the trained parameters baked in as constants,
// compiled once through any PJRT plugin (libtpu for TPU pods, a CPU
// plugin for tests) and executed per step with only the 8 graph arrays
// crossing the C ABI.
//
// Exported C ABI (see sevennet_exp_tpu/data/native.py for the ctypes
// mirror):
//   sevenn_pjrt_init(plugin_path)                 -> client handle
//   sevenn_pjrt_compile(client, code, opts, n)    -> executable handle
//   sevenn_pjrt_execute(exec, inputs...)          -> 0 on success
//   sevenn_pjrt_last_error()                      -> message of last failure
//
// Build:  g++ -O3 -shared -fPIC -I<dir containing xla/pjrt/c> \
//             pjrt_driver.cpp -o libsevenn_pjrt.so -ldl
// Demo:   g++ -O3 -DSEVENN_PJRT_MAIN -I... pjrt_driver.cpp -o pjrt_demo -ldl

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

thread_local std::string g_last_error;

void set_error(const PJRT_Api* api, PJRT_Error* err, const char* where) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  g_last_error = std::string(where) + ": " +
                 std::string(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
}

#define RETURN_IF_ERROR(api, expr, where, retval) \
  do {                                            \
    PJRT_Error* _err = (expr);                    \
    if (_err != nullptr) {                        \
      set_error((api), _err, (where));            \
      return (retval);                            \
    }                                             \
  } while (0)

struct SevennClient {
  void* dso = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;  // first addressable device
};

struct SevennExecutable {
  SevennClient* owner = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  size_t num_outputs = 0;
};

bool await_and_destroy(const PJRT_Api* api, PJRT_Event* event,
                       const char* where) {
  if (event == nullptr) return true;
  PJRT_Event_Await_Args aw;
  std::memset(&aw, 0, sizeof(aw));
  aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aw.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&aw);
  bool ok = true;
  if (err != nullptr) {
    set_error(api, err, where);
    ok = false;
  }
  PJRT_Event_Destroy_Args ed;
  std::memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.event = event;
  api->PJRT_Event_Destroy(&ed);
  return ok;
}

}  // namespace

extern "C" {

const char* sevenn_pjrt_last_error() { return g_last_error.c_str(); }

// Load a PJRT plugin (.so exposing GetPjrtApi) and create a client.
// `create_options` is an optional ";"-separated list of client options:
//   "key=value"        string option
//   "key:int=value"    int64 option
// libtpu needs none; proxy/tunnel plugins may require e.g. topology or
// session ids.
void* sevenn_pjrt_init_with_options(const char* plugin_path,
                                    const char* create_options);

void* sevenn_pjrt_init(const char* plugin_path) {
  return sevenn_pjrt_init_with_options(plugin_path, nullptr);
}

void* sevenn_pjrt_init_with_options(const char* plugin_path,
                                    const char* create_options) {
  void* dso = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (dso == nullptr) {
    g_last_error = std::string("dlopen: ") + dlerror();
    return nullptr;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(dso, "GetPjrtApi"));
  if (get_api == nullptr) {
    g_last_error = "plugin has no GetPjrtApi symbol";
    dlclose(dso);
    return nullptr;
  }
  const PJRT_Api* api = get_api();

  PJRT_Plugin_Initialize_Args init;
  std::memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  if (PJRT_Error* err = api->PJRT_Plugin_Initialize(&init)) {
    set_error(api, err, "PJRT_Plugin_Initialize");
    dlclose(dso);
    return nullptr;
  }

  // parse "k=v;k2:int=v2" into NamedValues (strings stay alive in vecs)
  std::vector<std::string> keys, svals;
  std::vector<int64_t> ivals;
  std::vector<int> kinds;  // 0 string, 1 int64
  if (create_options != nullptr && create_options[0] != '\0') {
    std::stringstream ss(create_options);
    std::string item;
    while (std::getline(ss, item, ';')) {
      auto eq = item.find('=');
      if (eq == std::string::npos) continue;
      std::string k = item.substr(0, eq), v = item.substr(eq + 1);
      int kind = 0;
      auto colon = k.find(":int");
      if (colon != std::string::npos) {
        kind = 1;
        k = k.substr(0, colon);
      }
      keys.push_back(k);
      kinds.push_back(kind);
      svals.push_back(v);
      ivals.push_back(kind == 1 ? std::strtoll(v.c_str(), nullptr, 10) : 0);
    }
  }
  std::vector<PJRT_NamedValue> nvs(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    std::memset(&nvs[i], 0, sizeof(PJRT_NamedValue));
    nvs[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nvs[i].name = keys[i].c_str();
    nvs[i].name_size = keys[i].size();
    if (kinds[i] == 1) {
      nvs[i].type = PJRT_NamedValue_kInt64;
      nvs[i].int64_value = ivals[i];
      nvs[i].value_size = 1;
    } else {
      nvs[i].type = PJRT_NamedValue_kString;
      nvs[i].string_value = svals[i].c_str();
      nvs[i].value_size = svals[i].size();
    }
  }

  PJRT_Client_Create_Args cc;
  std::memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = nvs.empty() ? nullptr : nvs.data();
  cc.num_options = nvs.size();
  if (PJRT_Error* err = api->PJRT_Client_Create(&cc)) {
    set_error(api, err, "PJRT_Client_Create");
    dlclose(dso);
    return nullptr;
  }

  auto fail_with_client = [&](const char* msg) -> void* {
    if (msg != nullptr) g_last_error = msg;
    PJRT_Client_Destroy_Args cd;
    std::memset(&cd, 0, sizeof(cd));
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = cc.client;
    api->PJRT_Client_Destroy(&cd);
    dlclose(dso);
    return nullptr;
  };

  PJRT_Client_AddressableDevices_Args ad;
  std::memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = cc.client;
  if (PJRT_Error* err = api->PJRT_Client_AddressableDevices(&ad)) {
    set_error(api, err, "PJRT_Client_AddressableDevices");
    return fail_with_client(nullptr);
  }
  if (ad.num_addressable_devices == 0) {
    return fail_with_client("no addressable devices");
  }

  auto* h = new SevennClient;
  h->dso = dso;
  h->api = api;
  h->client = cc.client;
  h->device = ad.addressable_devices[0];
  return h;
}

const char* sevenn_pjrt_platform(void* client_handle) {
  auto* h = static_cast<SevennClient*>(client_handle);
  static thread_local std::string name;
  PJRT_Client_PlatformName_Args pn;
  std::memset(&pn, 0, sizeof(pn));
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = h->client;
  PJRT_Error* err = h->api->PJRT_Client_PlatformName(&pn);
  if (err != nullptr) {
    set_error(h->api, err, "PJRT_Client_PlatformName");
    return "";
  }
  name.assign(pn.platform_name, pn.platform_name_size);
  return name.c_str();
}

// Compile an MLIR (StableHLO text or bytecode) program.
// `compile_options` is a serialized xla CompileOptionsProto — the
// deploy artifact ships it as compile_options.pb.
void* sevenn_pjrt_compile(void* client_handle, const char* code,
                          int64_t code_size, const char* compile_options,
                          int64_t options_size) {
  auto* h = static_cast<SevennClient*>(client_handle);
  const PJRT_Api* api = h->api;

  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(code);
  program.code_size = static_cast<size_t>(code_size);
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = h->client;
  args.program = &program;
  args.compile_options = compile_options;
  args.compile_options_size = static_cast<size_t>(options_size);
  RETURN_IF_ERROR(api, api->PJRT_Client_Compile(&args), "PJRT_Client_Compile",
                  nullptr);

  auto* e = new SevennExecutable;
  e->owner = h;
  e->exec = args.executable;

  PJRT_LoadedExecutable_GetExecutable_Args ge;
  std::memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = e->exec;
  if (api->PJRT_LoadedExecutable_GetExecutable(&ge) == nullptr) {
    PJRT_Executable_NumOutputs_Args no;
    std::memset(&no, 0, sizeof(no));
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no.executable = ge.executable;
    if (api->PJRT_Executable_NumOutputs(&no) == nullptr) {
      e->num_outputs = no.num_outputs;
    }
  }
  return e;
}

// dtype codes across the C ABI (subset of PJRT_Buffer_Type)
enum SevennDType : int32_t {
  SEVENN_F32 = 0,
  SEVENN_S32 = 1,
  SEVENN_F64 = 2,
  SEVENN_S64 = 3,
};

static PJRT_Buffer_Type to_pjrt_type(int32_t t) {
  switch (t) {
    case SEVENN_F32: return PJRT_Buffer_Type_F32;
    case SEVENN_S32: return PJRT_Buffer_Type_S32;
    case SEVENN_F64: return PJRT_Buffer_Type_F64;
    case SEVENN_S64: return PJRT_Buffer_Type_S64;
    default: return PJRT_Buffer_Type_INVALID;
  }
}

// Execute with n_inputs host arrays; copy every output into the
// caller-provided flat buffers (out_data[i], capacity out_bytes[i]).
// Single-device; per-step H2D/D2H copies, like the reference pair
// style's per-step tensor uploads (pair_e3gnn.cpp:218-235).
namespace {
void destroy_buffers(const PJRT_Api* api,
                     const std::vector<PJRT_Buffer*>& bufs) {
  for (PJRT_Buffer* b : bufs) {
    if (b == nullptr) continue;
    PJRT_Buffer_Destroy_Args bd;
    std::memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = b;
    api->PJRT_Buffer_Destroy(&bd);
  }
}
}  // namespace

int sevenn_pjrt_execute(void* exec_handle, int32_t n_inputs,
                        const void** in_data, const int64_t* in_dims_flat,
                        const int32_t* in_ndims, const int32_t* in_dtypes,
                        int32_t n_outputs, void** out_data,
                        const int64_t* out_bytes) {
  auto* e = static_cast<SevennExecutable*>(exec_handle);
  const PJRT_Api* api = e->owner->api;

  // every return path below must release inputs/outputs — a per-step
  // leak would OOM a long-running MD host on a flaky plugin
  std::vector<PJRT_Buffer*> inputs(n_inputs, nullptr);
  std::vector<PJRT_Buffer*> outputs(n_outputs, nullptr);
  int rc = 0;

  int64_t dim_off = 0;
  for (int32_t i = 0; i < n_inputs && rc == 0; ++i) {
    PJRT_Client_BufferFromHostBuffer_Args hb;
    std::memset(&hb, 0, sizeof(hb));
    hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    hb.client = e->owner->client;
    hb.data = in_data[i];
    hb.type = to_pjrt_type(in_dtypes[i]);
    hb.dims = in_dims_flat + dim_off;
    hb.num_dims = static_cast<size_t>(in_ndims[i]);
    dim_off += in_ndims[i];
    // kImmutableOnlyDuringCall: the plugin must copy synchronously
    // inside the call. Lazy/batching proxies may defer transfers until
    // an execute flush, so awaiting done_with_host_buffer here (as
    // kImmutableUntilTransferCompletes would require) can deadlock.
    hb.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
    hb.device = e->owner->device;
    PJRT_Error* err = api->PJRT_Client_BufferFromHostBuffer(&hb);
    if (err != nullptr) {
      set_error(api, err, "BufferFromHostBuffer");
      rc = -1;
      break;
    }
    inputs[i] = hb.buffer;
    if (hb.done_with_host_buffer != nullptr) {
      PJRT_Event_Destroy_Args ed;
      std::memset(&ed, 0, sizeof(ed));
      ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      ed.event = hb.done_with_host_buffer;
      api->PJRT_Event_Destroy(&ed);
    }
  }

  if (rc == 0) {
    PJRT_Buffer* const* arg_list = inputs.data();
    PJRT_Buffer** out_list = outputs.data();
    PJRT_Event* done = nullptr;

    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = e->exec;
    ex.options = &opts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = static_cast<size_t>(n_inputs);
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    ex.execute_device = e->owner->device;
    PJRT_Error* err = api->PJRT_LoadedExecutable_Execute(&ex);
    if (err != nullptr) {
      set_error(api, err, "LoadedExecutable_Execute");
      rc = -1;
    } else if (!await_and_destroy(api, done, "execute_done")) {
      rc = -1;
    }
  }

  for (int32_t i = 0; i < n_outputs && rc == 0; ++i) {
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outputs[i];
    th.dst = out_data[i];
    th.dst_size = static_cast<size_t>(out_bytes[i]);
    PJRT_Error* err = api->PJRT_Buffer_ToHostBuffer(&th);
    if (err != nullptr) {
      set_error(api, err, "Buffer_ToHostBuffer");
      rc = -1;
      break;
    }
    if (!await_and_destroy(api, th.event, "to_host_done")) rc = -1;
  }

  destroy_buffers(api, inputs);
  destroy_buffers(api, outputs);
  return rc;
}

int sevenn_pjrt_num_outputs(void* exec_handle) {
  return static_cast<int>(
      static_cast<SevennExecutable*>(exec_handle)->num_outputs);
}

void sevenn_pjrt_destroy_executable(void* exec_handle) {
  auto* e = static_cast<SevennExecutable*>(exec_handle);
  if (e == nullptr) return;
  PJRT_LoadedExecutable_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  d.executable = e->exec;
  e->owner->api->PJRT_LoadedExecutable_Destroy(&d);
  delete e;
}

void sevenn_pjrt_destroy_client(void* client_handle) {
  auto* h = static_cast<SevennClient*>(client_handle);
  if (h == nullptr) return;
  PJRT_Client_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  d.client = h->client;
  h->api->PJRT_Client_Destroy(&d);
  // leave the plugin loaded: other clients may share the dso
  delete h;
}

}  // extern "C"

#ifdef SEVENN_PJRT_MAIN
// Standalone demo: compile a deployed artifact and run one E/F/S step on
// zero-filled inputs (the C++ analog of the reference's
// example_inputs/md_serial_example smoke run).
//   pjrt_demo <plugin.so> <artifact_dir>
static std::string slurp(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

int main(int argc, char** argv) {
  setvbuf(stdout, nullptr, _IONBF, 0);
  setvbuf(stderr, nullptr, _IONBF, 0);
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <pjrt_plugin.so> <artifact_dir>\n",
                 argv[0]);
    return 2;
  }
  std::fprintf(stderr, "[demo] loading plugin %s\n", argv[1]);
  const std::string dir = argv[2];
  const char* opts_str = argc > 3 ? argv[3] : nullptr;
  void* client = sevenn_pjrt_init_with_options(argv[1], opts_str);
  if (client == nullptr) {
    std::fprintf(stderr, "init failed: %s\n", sevenn_pjrt_last_error());
    return 1;
  }
  std::printf("platform: %s\n", sevenn_pjrt_platform(client));

  std::string code = slurp(dir + "/model_const.stablehlo");
  std::string opts = slurp(dir + "/compile_options.pb");
  if (code.empty()) {
    std::fprintf(stderr, "missing %s/model_const.stablehlo\n", dir.c_str());
    return 1;
  }
  std::fprintf(stderr, "[demo] client up; compiling %zu bytes\n",
               code.size());
  void* exec = sevenn_pjrt_compile(client, code.data(),
                                   (int64_t)code.size(), opts.data(),
                                   (int64_t)opts.size());
  if (exec == nullptr) {
    std::fprintf(stderr, "compile failed: %s\n", sevenn_pjrt_last_error());
    return 1;
  }
  std::printf("compiled; num_outputs=%d\n", sevenn_pjrt_num_outputs(exec));

  // default export shapes (scripts/deploy.py): n_node=64, n_edge=1024.
  // Input order is the sorted data-key order recorded in signature.yaml:
  // atomic_numbers, batch, cell_volume, edge_index, edge_mask, edge_vec,
  // node_mask, num_atoms.
  const int64_t N = 64, E = 1024;
  std::vector<int32_t> atomic_numbers(N, 0), batch(N, 0);
  std::vector<float> cell_volume(1, 1.0f);
  std::vector<int32_t> edge_index(2 * E, 0);
  std::vector<float> edge_mask(E, 0.0f);
  std::vector<float> edge_vec(E * 3, 1.0f);
  std::vector<float> node_mask(N, 1.0f);
  std::vector<int32_t> num_atoms(1, (int32_t)N);

  const void* in_data[8] = {atomic_numbers.data(), batch.data(),
                            cell_volume.data(),   edge_index.data(),
                            edge_mask.data(),     edge_vec.data(),
                            node_mask.data(),     num_atoms.data()};
  const int64_t dims_flat[] = {N, N, 1, 2, E, E, E, 3, N, 1};
  const int32_t ndims[8] = {1, 1, 1, 2, 1, 2, 1, 1};
  const int32_t dtypes[8] = {SEVENN_S32, SEVENN_S32, SEVENN_F32, SEVENN_S32,
                             SEVENN_F32, SEVENN_F32, SEVENN_F32, SEVENN_S32};

  std::vector<float> energy(1), forces(N * 3), stress(6);
  void* out_data[3] = {energy.data(), forces.data(), stress.data()};
  const int64_t out_bytes[3] = {4, N * 3 * 4, 6 * 4};

  int rc = sevenn_pjrt_execute(exec, 8, in_data, dims_flat, ndims, dtypes, 3,
                               out_data, out_bytes);
  if (rc != 0) {
    std::fprintf(stderr, "execute failed: %s\n", sevenn_pjrt_last_error());
    return 1;
  }
  std::printf("E = %g eV ; f[0] = (%g, %g, %g)\n", energy[0], forces[0],
              forces[1], forces[2]);
  sevenn_pjrt_destroy_executable(exec);
  sevenn_pjrt_destroy_client(client);
  return 0;
}
#endif  // SEVENN_PJRT_MAIN
